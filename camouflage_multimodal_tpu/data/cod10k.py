"""COD10K dataset scanning and host-side decode.

Port of the reference loader behavior (``CODDataset``,
``/root/reference/models/region_graph/train.py:23-87``): scan the image dir,
keep only samples whose object/instance/edge GT quadruple is complete, decode
with PIL and resize to 256×256 (PIL bicubic, the reference's default
``Image.resize``).  Decode stays on host (the only part of the pipeline that
must); everything after the uint8 image is device compute.

Also parses the COD10K naming convention
``COD10K-CAM-{id}-{Env}-{seq}-{Organism}-{n}`` used by the embedding matcher
(``embedding_matcher.py:51-79``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

IMAGE_EXTS = (".png", ".jpg", ".jpeg")


def parse_cod10k_name(filename: str) -> Dict[str, Optional[str]]:
    """Split a COD10K filename into its convention fields.

    ``COD10K-CAM-1-Aquatic-1-BatFish-1.jpg`` →
    {'cam': 'CAM', 'cam_id': '1', 'environment': 'Aquatic', 'seq': '1',
     'organism': 'BatFish', 'index': '1'}.  Fields missing in shorter
    (NonCAM) names are None.
    """
    name = os.path.splitext(os.path.basename(filename))[0]
    parts = name.split("-")
    out: Dict[str, Optional[str]] = {
        "cam": None, "cam_id": None, "environment": None,
        "seq": None, "organism": None, "index": None,
    }
    if len(parts) >= 2:
        out["cam"] = parts[1]
    if len(parts) >= 3:
        out["cam_id"] = parts[2]
    if len(parts) >= 4:
        out["environment"] = parts[3]
    if len(parts) >= 5:
        out["seq"] = parts[4]
    if len(parts) >= 6:
        out["organism"] = parts[5]
    if len(parts) >= 7:
        out["index"] = parts[6]
    return out


def load_image_rgb(path: str, size: int = 256) -> np.ndarray:
    """Decode + resize an RGB image → (size, size, 3) float32 in [0, 1]."""
    img = Image.open(path).convert("RGB").resize((size, size))
    return np.asarray(img, dtype=np.float32) / 255.0


def load_mask(path: str, size: int = 256) -> np.ndarray:
    """Decode + resize a grayscale GT mask → (size, size) float32 in [0, 1]."""
    img = Image.open(path).convert("L").resize((size, size))
    return np.asarray(img, dtype=np.float32) / 255.0


@dataclass
class CODSample:
    image_name: str
    image_path: str
    mask_path: str
    instance_path: str
    edge_path: str


class CODDataset:
    """Scans for complete image + 3-GT quadruples (train.py:32-42).

    ``use_native`` routes batch decode through the C++ loader
    (native/dataio.cpp): libjpeg/libpng + a bit-exact reimplementation of
    Pillow's fixed-point BICUBIC resample — the host-side feed path for the
    TPU pipeline, ~1.7x faster than the PIL chain on this host. The default
    ``None`` auto-selects it when the shared library is available (output is
    identical to the PIL path); ``False`` forces PIL, ``True`` requires the
    native library.
    """

    def __init__(self, img_dir: str, mask_dir: str, instance_dir: str,
                 edge_dir: str, image_size: int = 256,
                 use_native: Optional[bool] = None) -> None:
        self.img_dir = img_dir
        self.image_size = image_size
        if use_native is None:
            from camouflage_multimodal_tpu import native

            use_native = native.available()
        self.use_native = use_native
        if use_native:
            from camouflage_multimodal_tpu import native

            if not native.available():
                raise RuntimeError("native dataio unavailable; build native/ "
                                   "or use use_native=False")
        all_images = sorted(
            f for f in os.listdir(img_dir) if f.lower().endswith(IMAGE_EXTS)
        )
        self.samples: List[CODSample] = []
        for img_name in all_images:
            base = os.path.splitext(img_name)[0]
            mask_path = os.path.join(mask_dir, base + ".png")
            instance_path = os.path.join(instance_dir, base + ".png")
            edge_path = os.path.join(edge_dir, base + ".png")
            if all(os.path.exists(p) for p in (mask_path, instance_path, edge_path)):
                self.samples.append(CODSample(
                    image_name=img_name,
                    image_path=os.path.join(img_dir, img_name),
                    mask_path=mask_path,
                    instance_path=instance_path,
                    edge_path=edge_path,
                ))

    def __len__(self) -> int:
        return len(self.samples)

    def load(self, idx: int) -> Dict[str, np.ndarray]:
        """Host decode of one sample → float arrays (image + 3 GT maps)."""
        s = self.samples[idx]
        return {
            "image": load_image_rgb(s.image_path, self.image_size),
            "mask": load_mask(s.mask_path, self.image_size),
            "instance": load_mask(s.instance_path, self.image_size),
            "edge": load_mask(s.edge_path, self.image_size),
            "image_name": s.image_name,
        }

    def load_batch(self, indices) -> Dict[str, np.ndarray]:
        if self.use_native:
            from camouflage_multimodal_tpu import native

            samples = [self.samples[i] for i in indices]
            images, ok_i = native.load_batch([s.image_path for s in samples],
                                             self.image_size)
            masks, ok_m = native.load_batch([s.mask_path for s in samples],
                                            self.image_size, gray=True)
            insts, ok_n = native.load_batch([s.instance_path for s in samples],
                                            self.image_size, gray=True)
            edges, ok_e = native.load_batch([s.edge_path for s in samples],
                                            self.image_size, gray=True)
            if (ok_i & ok_m & ok_n & ok_e).all():
                return {"image": images, "mask": masks, "instance": insts,
                        "edge": edges,
                        "image_name": [s.image_name for s in samples]}
            # fall through to the PIL path on any decode failure
        items = [self.load(i) for i in indices]
        return {
            "image": np.stack([it["image"] for it in items]),
            "mask": np.stack([it["mask"] for it in items]),
            "instance": np.stack([it["instance"] for it in items]),
            "edge": np.stack([it["edge"] for it in items]),
            "image_name": [it["image_name"] for it in items],
        }
