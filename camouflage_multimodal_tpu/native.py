"""ctypes bindings for the native host data loader (native/dataio.cpp).

Builds on first use if the shared library is missing (g++ + libjpeg/libpng);
falls back to the PIL path in :mod:`camouflage_multimodal_tpu.data.cod10k`
when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libcmtdataio.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, text=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _bind_dataio(lib: ctypes.CDLL) -> None:
    lib.cmt_load_image.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_float)]
    lib.cmt_load_image.restype = ctypes.c_int
    lib.cmt_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.cmt_load_batch.restype = ctypes.c_int
    lib.cmt_load_image_u8.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.cmt_load_image_u8.restype = ctypes.c_int
    lib.cmt_load_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.cmt_load_batch_u8.restype = ctypes.c_int
    lib.cmt_load_batch_u8_draft.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.cmt_load_batch_u8_draft.restype = ctypes.c_int


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    for attempt in range(2):
        try:
            lib = ctypes.CDLL(_SO_PATH)
            _bind_dataio(lib)
            _lib = lib
            break
        # AttributeError = a stale .so missing a newer symbol; rebuild once
        # and retry, else report unavailable so callers fall back to PIL
        # (advisor round-2: dataset construction must not hard-fail here).
        except (OSError, AttributeError):
            _lib = None
            if attempt == 0:
                try:
                    os.remove(_SO_PATH)
                except OSError:
                    pass
                if not _build():
                    break
    return _lib


def available() -> bool:
    return get_lib() is not None


def load_image(path: str, size: int = 256, gray: bool = False) -> np.ndarray:
    """Decode + bicubic-resize one image → float32 [0,1], (size,size[,3])."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native dataio unavailable")
    c = 1 if gray else 3
    out = np.empty(size * size * c, dtype=np.float32)
    rc = lib.cmt_load_image(path.encode(), size, int(gray),
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"native decode failed for {path}")
    return out.reshape((size, size) if gray else (size, size, 3))


_graph_lib: Optional[ctypes.CDLL] = None
_graph_tried = False


def get_graph_lib() -> Optional[ctypes.CDLL]:
    """libcmtgraph.so: CPU graph-builder (SLIC+Canny+features+RAG)."""
    global _graph_lib, _graph_tried
    if _graph_lib is not None or _graph_tried:
        return _graph_lib
    _graph_tried = True
    so = os.path.join(_NATIVE_DIR, "libcmtgraph.so")
    if not os.path.exists(so) and not _build():
        return None
    for attempt in range(2):
        try:
            lib = ctypes.CDLL(so)
            lib.cmt_build_region_graph.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.cmt_build_region_graph.restype = ctypes.c_int
            _graph_lib = lib
            break
        except (OSError, AttributeError):
            _graph_lib = None
            if attempt == 0:
                try:
                    os.remove(so)
                except OSError:
                    pass
                if not _build():
                    break
    return _graph_lib


def build_region_graph(image: np.ndarray, n_segments: int = 500,
                       compactness: float = 10.0, sigma: float = 1.0,
                       num_iters: int = 10, max_nodes: int = 640):
    """CPU-native region-graph build (no-accelerator fallback of
    pipeline.build_region_graphs). image: (H, W, 3) float32 in [0,1].

    Returns dict: segments (H,W) i32, features (K,15) f32, node_mask (K,)
    bool, edge_weights (K,K) f32, canny (H,W) bool."""
    lib = get_graph_lib()
    if lib is None:
        raise RuntimeError("native graph builder unavailable")
    image = np.ascontiguousarray(image, dtype=np.float32)
    H, W, _ = image.shape
    K = max_nodes
    segments = np.empty((H, W), dtype=np.int32)
    features = np.empty((K, 15), dtype=np.float32)
    node_mask = np.empty(K, dtype=np.uint8)
    weights = np.empty((K, K), dtype=np.float32)
    edges = np.empty((H, W), dtype=np.uint8)
    rc = lib.cmt_build_region_graph(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), H, W,
        n_segments, compactness, sigma, num_iters, K,
        segments.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        features.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        node_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc < 0:
        raise ValueError(f"max_nodes={K} too small for the SLIC grid")
    return {
        "segments": segments,
        "features": features,
        "node_mask": node_mask.astype(bool),
        "edge_weights": weights,
        "canny": edges.astype(bool),
        "num_clusters": rc,
    }


def load_batch(paths: List[str], size: int = 256, gray: bool = False,
               n_threads: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded batch decode. Returns (batch (N,size,size[,3]), ok (N,) bool)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native dataio unavailable")
    n = len(paths)
    c = 1 if gray else 3
    out = np.empty((n, size * size * c), dtype=np.float32)
    status = np.empty(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads is None:
        n_threads = min(max(os.cpu_count() or 1, 1), 8)
    lib.cmt_load_batch(arr, n, size, int(gray),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                       n_threads)
    shape = (n, size, size) if gray else (n, size, size, 3)
    return out.reshape(shape), status == 0


def load_batch_u8(paths: List[str], size: int = 256, gray: bool = False,
                  n_threads: Optional[int] = None,
                  draft: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded batch decode straight to uint8 (PIL-rounded bytes) — the
    natural feed for the device-side normalize (ops/image.py), 4x smaller
    on the host link than the float path. Returns (batch uint8, ok).

    ``draft=True`` decodes JPEGs at the smallest libjpeg M/8 DCT scale that
    still covers ``size`` on both axes — the IDCT itself performs a
    high-quality low-pass downsample, cutting decode+resize work ~2x. The
    result deviates slightly from the full-resolution PIL chain (PNG inputs
    are unaffected); use for throughput-bound inference, not parity tests."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native dataio unavailable")
    n = len(paths)
    c = 1 if gray else 3
    out = np.empty((n, size * size * c), dtype=np.uint8)
    status = np.empty(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads is None:
        n_threads = min(max(os.cpu_count() or 1, 1), 8)
    lib.cmt_load_batch_u8_draft(arr, n, size, int(gray), int(draft),
                                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                                status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                                n_threads)
    shape = (n, size, size) if gray else (n, size, size, 3)
    return out.reshape(shape), status == 0
