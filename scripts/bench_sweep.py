#!/usr/bin/env python
"""Re-runnable bench sweep over BASELINE.json's named configs.

Runs ``bench.py`` as a subprocess per (image_size, batch) row — each row is
a fresh process so no stale executables leak between shapes (the persistent
/tmp/jax_cache keeps recompiles cheap) — and rewrites
``artifacts/bench_sweep.json``. Run with the TPU idle; quoted doc numbers
(docs/ARCHITECTURE.md, PARITY.md) must reproduce from this artifact within
tunnel noise (VERDICT r4 item 3).
"""

import datetime
import json
import os
import subprocess
import sys

ROWS = [(256, 16), (352, 16), (352, 32), (416, 16)]
BASELINE = 1.0 / 2.2161


def run_row(size, batch):
    env = dict(os.environ, BENCH_IMAGE_SIZE=str(size), BENCH_BATCH=str(batch))
    out = subprocess.run([sys.executable, "bench.py"], env=env,
                         capture_output=True, text=True, timeout=3600)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    row = {
        "image_size": size,
        "batch": batch,
        "e2e_imgs_per_sec": r["value"],
        "e2e_vs_baseline": r["vs_baseline"],
        "e2e_median_imgs_per_sec": r.get("e2e_median_imgs_per_sec"),
        "device_only_imgs_per_sec": r["device_only_imgs_per_sec"],
        "p50_per_image_ms": r["p50_per_image_ms"],
        "p50_batch1_ms": r["p50_batch1_ms"],
        "draft_decode_imgs_per_sec": r.get("draft_decode_imgs_per_sec"),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = [run_row(s, b) for s, b in ROWS]
    doc = {
        "description": (
            "bench.py sweep over BASELINE.json's named configs (one v5e "
            "chip; end-to-end = host JPEG decode | transfer | compute "
            "3-stage pipeline; every timed iteration ends with a "
            "device->host scalar pull, the only reliable completion barrier "
            "on this remote runtime; reference anchor 2.216 s/image = "
            "0.4513 img/s)"),
        "date": str(datetime.date.today()),
        "generated_by": "scripts/bench_sweep.py",
        "rows": rows,
        "notes": [
            "e2e best-of-passes estimates no-stall capability through the "
            "tunnel; e2e_median is what a typical pass delivers.",
            "Production SLIC window is 7x7 (window_radius=3, provably "
            "exact on all measured COD10K drift) as of round 5 — these "
            "rows measure the production configuration.",
        ],
    }
    with open("artifacts/bench_sweep.json", "w") as f:
        json.dump(doc, f, indent=2)
    print("wrote artifacts/bench_sweep.json")


if __name__ == "__main__":
    main()
