"""Per-stage wall-clock profile of the inference pipeline with real barriers.

Times each pipeline stage (SLIC iterations, connectivity, Canny, segment
features, adjacency, RAG weights, GNN, fusion, paint-back) as its OWN jitted
executable at bench shapes, ending every timed iteration with a device→host
scalar pull (on this runtime ``block_until_ready`` can return at enqueue —
CLAUDE.md timing trap). Stage sums exceed the fused end-to-end cost slightly
(XLA fuses across stage boundaries in the real program).

    python scripts/profile_stages.py --image-size 352 --batch 16 --iters 20
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

from camouflage_multimodal_tpu.core.runtime import (  # noqa: E402
    enable_persistent_compile_cache)

enable_persistent_compile_cache()


def timed(fn, args, iters, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
        _pull(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _pull(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _pull(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=352)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n-segments", type=int, default=500)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from camouflage_multimodal_tpu.data.cod10k import load_image_rgb
    from camouflage_multimodal_tpu.ops.canny import canny
    from camouflage_multimodal_tpu.ops.connectivity import (
        enforce_label_connectivity, enforce_label_connectivity_batched)
    from camouflage_multimodal_tpu.ops.image import rgb_to_gray
    from camouflage_multimodal_tpu.ops.rag import (rag_edge_weights,
                                                   region_adjacency)
    from camouflage_multimodal_tpu.ops.regions import region_features
    from camouflage_multimodal_tpu.ops.slic import slic
    from camouflage_multimodal_tpu.pipeline import padded_nodes

    S, B, N = args.image_size, args.batch, args.n_segments
    K = padded_nodes(N, S)
    img_dir = "/root/reference/data/COD10K/images"
    names = sorted(os.listdir(img_dir))[:: max(len(os.listdir(img_dir)) // B, 1)][:B]
    imgs = jnp.asarray(np.stack(
        [load_image_rgb(os.path.join(img_dir, n), S) for n in names]),
        jnp.float32)

    vj = lambda f: jax.jit(jax.vmap(f))  # noqa: E731

    slic_raw = vj(lambda im: slic(im, n_segments=N, enforce_connectivity=False))
    conn = vj(lambda lab: enforce_label_connectivity(lab, N, max_labels=K))
    gray = vj(rgb_to_gray)
    edges_f = vj(lambda g: canny(g, sigma=2.0))
    feats_f = vj(lambda im, seg, e: region_features(im, seg, e, K)["features"])
    adj_f = vj(lambda seg: region_adjacency(seg, K))
    ragw_f = vj(rag_edge_weights)

    labels_raw = slic_raw(imgs)
    labels = conn(labels_raw)
    g = gray(imgs)
    edges = edges_f(g)
    feats = feats_f(imgs, labels, edges)
    adj = adj_f(labels)

    from camouflage_multimodal_tpu.models.region_graph import RegionGraphGNN
    model = RegionGraphGNN()
    variables = model.init(jax.random.PRNGKey(0), feats, adj,
                           ragw_f(feats, adj), jnp.ones((B, K), bool))
    gnn_f = jax.jit(lambda v, f, a, w, m: model.apply(v, f, a, w, m))

    conn_runs = jax.jit(lambda lab: enforce_label_connectivity_batched(
        lab, N, max_labels=K))

    # Dispatch floor: a trivial jitted program timed the same way — every
    # isolated stage number below includes roughly this much tunnel/dispatch
    # overhead (CLAUDE.md RTT trap); subtract it mentally when comparing
    # stages, or trust the fused pipeline number from bench.py.
    floor_f = jax.jit(lambda x: x + 1.0)
    floor_ms = timed(floor_f, (jnp.zeros((), jnp.float32),), args.iters) * 1000.0 / B

    stages = {
        "slic_iterations": (slic_raw, (imgs,)),
        "connectivity": (conn, (labels_raw,)),
        "connectivity_runs": (conn_runs, (labels_raw,)),
        "canny": (edges_f, (g,)),
        "segment_features": (feats_f, (imgs, labels, edges)),
        "adjacency": (adj_f, (labels,)),
        "rag_weights": (ragw_f, (feats, adj)),
        "rg_gnn": (gnn_f, (variables, feats, adj, ragw_f(feats, adj),
                           jnp.ones((B, K), bool))),
    }
    out = {}
    for name, (fn, a) in stages.items():
        ms = timed(fn, a, args.iters) * 1000.0 / B
        out[name] = round(ms, 2)
        print(f"{name:20s} {ms:7.2f} ms/img", flush=True)
    out["_dispatch_floor_ms_per_img"] = round(floor_ms, 2)
    out["_total_ms_per_img"] = round(
        sum(v for k, v in out.items() if not k.startswith("_")
            and k != "connectivity_runs"), 2)
    out["_config"] = {"image_size": S, "batch": B, "n_segments": N,
                      "backend": jax.devices()[0].platform}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
