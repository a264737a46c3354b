"""Offline RG embedding factory.

Behavioral port of ``extract_rg_embeddings.batch_extract_embeddings``
(``/root/reference/models/region_graph/extract_rg_embeddings.py:301-483``):
walks an image directory, extracts per-image node ([N,128]) and graph
([1,128]) embeddings, persists per-image artifacts + a combined store +
``embedding_summary.json`` with the same timing-stats schema (the
2.216 s/image baseline number comes from that file).

TPU formulation: images are processed in device batches through the jitted
pipeline instead of one-at-a-time on CPU; per-image artifacts are compacted
to the true node count (padding stripped) so the store schema matches the
reference's variable-size records.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from camouflage_multimodal_tpu.core.artifacts import save_rg_embeddings
from camouflage_multimodal_tpu.data.cod10k import IMAGE_EXTS, load_image_rgb
from camouflage_multimodal_tpu.pipeline import RegionGraphPipeline


def extract_embeddings_from_image(pipeline: RegionGraphPipeline, variables,
                                  image_path: str):
    """Single-image extraction (extract_rg_embeddings.py:249-288).

    Returns (node_embeddings [N,128], graph_embedding [1,128], segments)."""
    image = load_image_rgb(image_path, pipeline.image_size)
    out = pipeline(variables, jnp.asarray(image[None]))
    node_mask = np.asarray(out["node_mask"][0])
    node_emb = np.asarray(out["node_embeddings"][0])[node_mask]
    graph_emb = np.asarray(out["graph_embedding"][0])[None]
    segments = np.asarray(out["segments"][0])
    return node_emb, graph_emb, segments


def batch_extract_embeddings(pipeline: RegionGraphPipeline, variables,
                             image_dir: str, output_dir: str,
                             max_images: Optional[int] = None,
                             batch_size: int = 16,
                             save_individual: bool = False,
                             log_fn=print) -> Tuple[Dict, Dict]:
    os.makedirs(output_dir, exist_ok=True)
    image_files = sorted(f for f in os.listdir(image_dir)
                         if f.lower().endswith(IMAGE_EXTS))
    if max_images:
        image_files = image_files[:max_images]
    total = len(image_files)

    all_embeddings: Dict[str, Dict] = {}
    summary = {
        "total_images": total,
        "embedding_dim": 128,
        "n_segments": pipeline.n_segments,
        "model_path": None,
        "processing_time": None,
        "images": {},
    }
    failed = []
    start = time.time()

    def _decode_chunk(chunk):
        """Host decode of one batch: threaded C++ loader (bit-exact with the
        PIL chain) when built, with per-image PIL fallback on failure."""
        from camouflage_multimodal_tpu import native

        images, names = [], []
        if native.available():
            paths = [os.path.join(image_dir, f) for f in chunk]
            batch_u8, ok = native.load_batch_u8(paths, pipeline.image_size)
            for f, one, good in zip(chunk, batch_u8, ok):
                if good:
                    images.append(one)
                    names.append(f)
                else:
                    failed.append((f, "native decode failed"))
            return images, names
        for f in chunk:
            try:
                img = load_image_rgb(os.path.join(image_dir, f),
                                     pipeline.image_size)
                images.append((img * 255.0).round().astype(np.uint8))
                names.append(f)
            except Exception as e:
                failed.append((f, str(e)))
        return images, names

    def _upload(decoded):
        """Pad + ship one uint8 batch (its own pipeline stage: the tunneled
        link moves a batch at ~27 MB/s, comparable to decode cost — chaining
        them in one worker would serialize ~360 ms against ~300 ms of device
        compute)."""
        images, names = decoded
        if not images:
            return None, names
        batch = np.stack(images)
        if batch.shape[0] < batch_size:
            pad = batch_size - batch.shape[0]
            batch = np.concatenate(
                [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
        dev = jnp.asarray(batch)
        np.asarray(dev[0, 0, 0, 0])  # copy really on device before handoff
        return dev, names

    def _record_batch(names, out):
        node_mask = out["node_mask"]
        node_embs = out["node_embeddings"]
        graph_embs = out["graph_embedding"]
        segments = out.get("segments")
        raw_feats = out.get("region_features")
        for j, name in enumerate(names):
            node_emb = node_embs[j][node_mask[j]]
            graph_emb = graph_embs[j][None]
            rec = {
                "node_embeddings": node_emb,
                "graph_embedding": graph_emb,
                "num_nodes": int(node_emb.shape[0]),
            }
            all_embeddings[name] = rec
            base = os.path.splitext(name)[0]
            if save_individual:
                np.savez_compressed(
                    os.path.join(output_dir, f"{base}_embedding.npz"),
                    image_name=name, node_embeddings=node_emb,
                    graph_embedding=graph_emb, num_nodes=node_emb.shape[0],
                    segments=segments[j],
                    node_features=raw_feats[j][node_mask[j]],
                )
            summary["images"][name] = {
                "num_nodes": int(node_emb.shape[0]),
                "node_embedding_shape": list(node_emb.shape),
                "graph_embedding_shape": list(graph_emb.shape),
            }
        done = len(all_embeddings) + len(failed)
        elapsed = time.time() - start
        rate = done / elapsed if elapsed > 0 else 0.0
        log_fn(f"  {done}/{total} images ({rate:.1f} img/s, "
               f"ETA {((total - done) / max(rate, 1e-9)):.0f}s)")

    # Four-stage software pipeline over batches: decode (C++ threads) ∥
    # host→device upload ∥ device compute ∥ device→host download, with the
    # record step on the main thread. Decode, upload, and download each cost
    # a sizeable fraction of the ~300 ms device program on this tunneled
    # host (~160/200/200 ms per 16×352² batch — the link moves ~27 MB/s), so
    # each gets its own worker; throughput tracks the SLOWEST stage instead
    # of their sum. ONE device→host pull per batch (jax.device_get of a
    # dict) instead of one per output — per-call RTT also matters here.
    from concurrent.futures import ThreadPoolExecutor

    import jax

    pull_keys = ["node_mask", "node_embeddings", "graph_embedding"]
    if save_individual:
        pull_keys += ["segments", "region_features"]
    chunks = [image_files[i: i + batch_size]
              for i in range(0, total, batch_size)]
    n = len(chunks)

    def _download(names, out_dev):
        return names, jax.device_get({k: out_dev[k] for k in pull_keys})

    with ThreadPoolExecutor(max_workers=1) as dec_ex, \
            ThreadPoolExecutor(max_workers=1) as up_ex, \
            ThreadPoolExecutor(max_workers=1) as down_ex:
        dec_fut = dec_ex.submit(_decode_chunk, chunks[0]) if n else None
        up_fut = None
        if n:
            up_fut = up_ex.submit(_upload, dec_fut.result())
            dec_fut = dec_ex.submit(_decode_chunk, chunks[1]) if n > 1 else None
        down_fut = None
        for ci in range(n):
            dev_batch, names = up_fut.result()
            if ci + 1 < n:
                up_fut = up_ex.submit(_upload, dec_fut.result())
                if ci + 2 < n:
                    dec_fut = dec_ex.submit(_decode_chunk, chunks[ci + 2])
            out = (pipeline(variables, dev_batch)
                   if dev_batch is not None else None)
            if down_fut is not None:
                _record_batch(*down_fut.result())
                down_fut = None
            if out is not None:
                down_fut = down_ex.submit(_download, names, out)
        if down_fut is not None:
            _record_batch(*down_fut.result())

    total_time = time.time() - start
    successful = len(all_embeddings)
    combined = os.path.join(output_dir, "all_rg_embeddings.npz")
    save_rg_embeddings(combined, all_embeddings)

    summary["processing_time"] = {
        "total_seconds": total_time,
        "avg_per_image": total_time / successful if successful else 0.0,
        "successful_images": successful,
        "failed_images": len(failed),
    }
    with open(os.path.join(output_dir, "embedding_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return all_embeddings, summary


def format_time(seconds: float) -> str:
    """Readable duration (reference extract_rg_embeddings.py:290-299)."""
    if seconds < 60:
        return f"{seconds:.1f}s"
    if seconds < 3600:
        return f"{seconds / 60:.1f}m"
    return f"{seconds / 3600:.2f}h"
