#!/usr/bin/env python
"""A/B the serve path's light-load latency: bucketed vs fixed-batch padding.

Measures the REAL MicroBatcher path (submit → coalesce → padded program →
fan-out) with sequential single requests — the light-load regime VERDICT r4
item 7 flagged (p50_batch1 43 ms vs 12.7 ms/img in-batch): with
``bucketed=False`` every lone request pays the full batch-``B`` program;
with the round-5 bucketed batcher it runs the batch-1 program. Writes
artifacts/serve_latency_ab.json.

Run with the TPU idle; every request's future.result() IS the
device→host completion barrier (the result dict holds pulled numpy rows).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from camouflage_multimodal_tpu.core.runtime import enable_persistent_compile_cache

enable_persistent_compile_cache()

SIZE = int(os.environ.get("SERVE_IMAGE_SIZE", 256))
BATCH = int(os.environ.get("SERVE_BATCH", 8))
N_REQ = 40


def main():
    from camouflage_multimodal_tpu.api import MultimodalPredictor
    from camouflage_multimodal_tpu.serve import MicroBatcher

    fusion_ckpt = "artifacts/checkpoints_balanced/multimodal_best_fixed.ckpt"
    if not os.path.exists(fusion_ckpt):
        fusion_ckpt = "artifacts/fidelity/multimodal_best.pth"
    pred = MultimodalPredictor(
        fusion_checkpoint=fusion_ckpt,
        rg_checkpoint="artifacts/rg_model.ckpt",
        kg_embeddings_path="artifacts/kg_embeddings/all_embeddings.npz")

    import glob

    from camouflage_multimodal_tpu.data.cod10k import load_image_rgb

    paths = sorted(glob.glob("/root/reference/data/COD10K/images/*.jpg"))[:4]
    imgs = [(load_image_rgb(p, SIZE) * 255).round().astype(np.uint8)
            for p in paths]

    results = {}
    for bucketed in (True, False):
        b = MicroBatcher(pred.predict_batch, batch_size=BATCH,
                         max_wait_ms=2.0, bucketed=bucketed)
        try:
            # warm every shape this mode can hit under sequential load
            for bs in b.buckets:
                pred.predict_batch(np.zeros((bs, SIZE, SIZE, 3), np.uint8))
            b.submit(imgs[0]).result(timeout=600)
            lats = []
            for i in range(N_REQ):
                t0 = time.perf_counter()
                b.submit(imgs[i % len(imgs)]).result(timeout=120)
                lats.append(time.perf_counter() - t0)
            lats.sort()
            st = b.stats()
            results["bucketed" if bucketed else "fixed_batch"] = {
                "p50_ms": round(1e3 * lats[len(lats) // 2], 2),
                "p95_ms": round(1e3 * lats[int(len(lats) * 0.95)], 2),
                "stats_p50_ms": st["p50_latency_ms"],
                "mean_batch_occupancy": st["mean_batch_occupancy"],
                "buckets": st["bucket_sizes"],
            }
        finally:
            b.close()

    out = {"image_size": SIZE, "batch_size": BATCH,
           "n_sequential_requests": N_REQ, "modes": results}
    with open("artifacts/serve_latency_ab.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
