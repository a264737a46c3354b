"""Benchmark: end-to-end multimodal inference throughput on one chip.

Measures the FULL per-image pipeline the reference ran on CPU at
2.216 s/image (/root/reference/models/region_graph/rg_embeddings/
embedding_summary.json): decode-normalized image → SLIC superpixels → Canny
→ 15-dim segment features → RAG → RegionGraphGNN → cross-attention fusion →
4 heads + per-pixel heatmap — here as one jitted XLA program, batched.

Prints ONE JSON line:
  {"metric": "images/sec/chip multimodal inference 256x256",
   "value": <imgs/s>, "unit": "images/sec", "vs_baseline": <speedup vs
   0.4513 img/s reference CPU anchor>, ...extras}
"""

import glob
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

import os as _os

BATCH = int(_os.environ.get("BENCH_BATCH", 16))
WARMUP = 5
ITERS = int(_os.environ.get("BENCH_ITERS", 50))
IMAGE_SIZE = int(_os.environ.get("BENCH_IMAGE_SIZE", 256))  # 352/416 per BASELINE configs
N_SEGMENTS = int(_os.environ.get("BENCH_N_SEGMENTS", 500))
REFERENCE_SECONDS_PER_IMAGE = 2.2161  # reference embedding_summary.json


def _load_images(n):
    """Real COD10K images when the reference mount is present, else noise."""
    paths = sorted(glob.glob("/root/reference/data/COD10K/images/*.jpg"))[:n]
    if paths:
        from camouflage_multimodal_tpu.data.cod10k import load_image_rgb

        return np.stack([load_image_rgb(p, IMAGE_SIZE) for p in paths])
    rng = np.random.default_rng(0)
    return rng.random((n, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.float32)


def main():
    from camouflage_multimodal_tpu.models.fusion import MultimodalCamouflageDetector
    from camouflage_multimodal_tpu.models.region_graph import RegionGraphGNN
    from camouflage_multimodal_tpu.pipeline import (
        MultimodalPipeline,
        RegionGraphPipeline,
        padded_nodes,
    )

    rng = jax.random.PRNGKey(0)
    rg_model = RegionGraphGNN()
    fusion_model = MultimodalCamouflageDetector()
    max_nodes = padded_nodes(N_SEGMENTS, IMAGE_SIZE)
    rg_pipe = RegionGraphPipeline(rg_model, n_segments=N_SEGMENTS,
                                  image_size=IMAGE_SIZE, max_nodes=max_nodes)
    pipe = MultimodalPipeline(rg_pipe, fusion_model)

    K = max_nodes
    rg_vars = rg_model.init(rng, jnp.zeros((1, K, 15)), jnp.zeros((1, K, K), bool),
                            jnp.zeros((1, K, K)), jnp.ones((1, K), bool))
    fusion_vars = fusion_model.init(rng, jnp.zeros((1, K, 128)), jnp.zeros((1, 13, 128)))
    kg = jax.random.normal(rng, (13, 128))

    # Two distinct batches, alternated, so no call can reuse a cached result.
    raw = _load_images(2 * BATCH)
    if raw.shape[0] < 2 * BATCH:
        raw = np.concatenate([raw] * (2 * BATCH // max(raw.shape[0], 1) + 1))[: 2 * BATCH]
    batches = [jnp.asarray(raw[:BATCH]), jnp.asarray(raw[BATCH:2 * BATCH])]

    def run(i):
        out = pipe(rg_vars, fusion_vars, batches[i % 2], kg)
        out["heatmap"].block_until_ready()
        return out

    for i in range(WARMUP):
        run(i)

    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        run(i)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))

    imgs_per_sec = BATCH / med
    p50_latency_ms = med / BATCH * 1000.0
    baseline_imgs_per_sec = 1.0 / REFERENCE_SECONDS_PER_IMAGE

    # Host-decode-inclusive number (the reference's 2.216 s/image included
    # its PIL decode): threaded native C++ decode feeding the device.
    decode_imgs_per_sec = None
    try:
        import glob as _glob

        from camouflage_multimodal_tpu import native

        paths = sorted(_glob.glob("/root/reference/data/COD10K/images/*.jpg"))[:BATCH]
        if native.available() and paths:
            # warm the uint8-input executable
            warm, _ = native.load_batch(paths, IMAGE_SIZE)
            warm_u8 = (warm * 255.0).round().astype(np.uint8)
            pipe(rg_vars, fusion_vars, jnp.asarray(warm_u8), kg)["heatmap"].block_until_ready()
            t0 = time.perf_counter()
            n_done = 0
            for i in range(4):
                host_batch, ok = native.load_batch(paths, IMAGE_SIZE)
                u8 = (host_batch * 255.0).round().astype(np.uint8)
                out = pipe(rg_vars, fusion_vars, jnp.asarray(u8), kg)
                out["heatmap"].block_until_ready()
                n_done += len(paths)
            decode_imgs_per_sec = n_done / (time.perf_counter() - t0)
    except Exception:
        pass

    result = {
        "metric": f"images/sec/chip multimodal inference {IMAGE_SIZE}x{IMAGE_SIZE} (SLIC+features+RAG+GNN+fusion+heatmap)",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / baseline_imgs_per_sec, 2),
        "p50_per_image_ms": round(p50_latency_ms, 3),
        "batch": BATCH,
        "backend": jax.default_backend(),
    }
    if decode_imgs_per_sec is not None:
        result["with_host_decode_imgs_per_sec"] = round(decode_imgs_per_sec, 2)
        result["with_host_decode_vs_baseline"] = round(
            decode_imgs_per_sec / baseline_imgs_per_sec, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
