#!/usr/bin/env python
"""Host-side ceiling analysis for the e2e benchmark (VERDICT r4 item 5).

The e2e pipeline (bench.py) runs decode ∥ transfer ∥ compute as three
workers, but this host has ONE physical core — the decode worker, the
transfer worker's protocol/copy work, and the Python dispatch all time-share
it, so the e2e rate is bounded by BOTH the slowest stage and the total
host-CPU work per batch. This script measures each stage in isolation and
writes artifacts/host_ceiling.json:

* decode_ms_per_img      — native C++ decode+resize (full and draft-IDCT)
* transfer_ms_per_img    — uint8 host→device over the tunnel, completion-
                           barriered (one scalar pull per batch)
* compute_ms_per_img     — device-only pipeline rate (two resident batches,
                           pipelined pulls — same protocol as bench.py)
* ceiling estimates      — max(stage) [infinite-core bound] and
                           cpu_sum = decode + host-side transfer/dispatch
                           work [single-core bound]

Run with the TPU idle; every figure ends in a device→host pull (CLAUDE.md
timing rules).
"""

import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from camouflage_multimodal_tpu.core.runtime import enable_persistent_compile_cache

enable_persistent_compile_cache()

BATCH = int(os.environ.get("BENCH_BATCH", 16))
SIZE = int(os.environ.get("BENCH_IMAGE_SIZE", 352))
N_SEGMENTS = int(os.environ.get("BENCH_N_SEGMENTS", 500))
PASSES = 6


def _paths(n):
    return sorted(glob.glob("/root/reference/data/COD10K/images/*.jpg"))[:n]


def med_of(f, passes=PASSES):
    ts = []
    for _ in range(passes):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from camouflage_multimodal_tpu import native
    from camouflage_multimodal_tpu.models.fusion import MultimodalCamouflageDetector
    from camouflage_multimodal_tpu.models.region_graph import RegionGraphGNN
    from camouflage_multimodal_tpu.pipeline import (
        MultimodalPipeline, RegionGraphPipeline, padded_nodes)

    assert native.available(), "native decoder required for the analysis"
    paths = _paths(2 * BATCH)
    pb = [paths[:BATCH], paths[BATCH:2 * BATCH]]

    # --- decode stage (single worker thread = the one core) ---------------
    native.load_batch_u8(pb[0], SIZE)  # warm page cache
    native.load_batch_u8(pb[1], SIZE)
    dec_full = med_of(lambda: native.load_batch_u8(pb[0], SIZE)) / BATCH
    dec_draft = med_of(
        lambda: native.load_batch_u8(pb[0], SIZE, draft=True)) / BATCH

    # --- transfer stage ----------------------------------------------------
    arrs = [native.load_batch_u8(p, SIZE)[0] for p in pb]

    def tx(i):
        dev = jnp.asarray(arrs[i % 2])
        np.asarray(dev[0, 0, 0, 0])  # completion barrier

    tx(0)
    i = [0]

    def tx_once():
        tx(i[0])
        i[0] += 1

    tx_ms = med_of(tx_once) / BATCH

    # --- compute stage (device-only, pipelined pulls like bench.py) --------
    rng = jax.random.PRNGKey(0)
    rg_model = RegionGraphGNN()
    fusion_model = MultimodalCamouflageDetector()
    max_nodes = padded_nodes(N_SEGMENTS, SIZE)
    rg_pipe = RegionGraphPipeline(rg_model, n_segments=N_SEGMENTS,
                                  image_size=SIZE, max_nodes=max_nodes)
    pipe = MultimodalPipeline(rg_pipe, fusion_model)
    K = max_nodes
    rg_vars = rg_model.init(rng, jnp.zeros((1, K, 15)),
                            jnp.zeros((1, K, K), bool), jnp.zeros((1, K, K)),
                            jnp.ones((1, K), bool))
    fusion_vars = fusion_model.init(rng, jnp.zeros((1, K, 128)),
                                    jnp.zeros((1, 13, 128)))
    kg = jax.random.normal(rng, (13, 128))
    dev_batches = [jnp.asarray(a) for a in arrs]

    def dispatch(j):
        return pipe(rg_vars, fusion_vars, dev_batches[j % 2], kg)

    pending = dispatch(0)
    for j in range(4):
        nxt = dispatch(j + 1)
        np.asarray(pending["score"][0, 0])
        pending = nxt
    times = []
    for j in range(12):
        t0 = time.perf_counter()
        nxt = dispatch(j)
        np.asarray(pending["score"][0, 0])
        pending = nxt
        times.append(time.perf_counter() - t0)
    np.asarray(pending["score"][0, 0])
    compute_ms = float(np.median(times)) / BATCH

    # --- host-CPU accounting -----------------------------------------------
    # decode is pure host CPU; the transfer's wall time is tunnel-bound but
    # its host-CPU share (buffer copy + protocol) is measured as the CPU
    # time the process burns during a transfer-only loop.
    t_cpu0, t_wall0 = time.process_time(), time.perf_counter()
    for _ in range(4):
        tx_once()
    tx_cpu_ms = (time.process_time() - t_cpu0) / 4 / BATCH * 1e3
    tx_wall_check = (time.perf_counter() - t_wall0) / 4 / BATCH * 1e3

    stages_ms = {"decode_full": dec_full * 1e3, "transfer": tx_ms * 1e3,
                 "compute": compute_ms * 1e3}
    binding = max(stages_ms, key=stages_ms.get)
    cpu_sum_ms = dec_full * 1e3 + tx_cpu_ms  # per image, excl. dispatch
    out = {
        "batch": BATCH, "image_size": SIZE,
        "decode_full_ms_per_img": round(dec_full * 1e3, 3),
        "decode_draft_ms_per_img": round(dec_draft * 1e3, 3),
        "transfer_ms_per_img": round(tx_ms * 1e3, 3),
        "transfer_host_cpu_ms_per_img": round(tx_cpu_ms, 3),
        "transfer_wall_check_ms_per_img": round(tx_wall_check, 3),
        "compute_ms_per_img": round(compute_ms * 1e3, 3),
        "binding_stage_infinite_cores": binding,
        "ceiling_imgs_per_sec_stage_bound": round(
            1e3 / max(stages_ms.values()), 2),
        "ceiling_imgs_per_sec_single_core_cpu_bound": round(
            1e3 / max(cpu_sum_ms, max(stages_ms.values())), 2),
        "host_cores": os.cpu_count(),
        "notes": [
            "stage-bound ceiling assumes each worker gets its own core; the "
            "single-core bound adds decode + transfer host-CPU work, which "
            "time-share the one physical core with Python dispatch.",
        ],
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/host_ceiling.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
