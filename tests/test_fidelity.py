"""In-suite composed-fidelity sample: the ≥95% gate on a 2-image slice.

The full 50-image measurement lives in ``scripts/fidelity_gate.py`` →
``artifacts/fidelity_report.json``; this test pins the same composed
comparison (reference numpy/scipy/torch pipeline ``test.py:185-362`` vs the
JAX ``RegionGraphPipeline``) with the committed reference-trained torch
checkpoint, so a regression in SLIC/Canny/features/RAG/GNN/paint-back or in
the torch→flax transplant fails the suite rather than only the offline gate.
"""

import glob
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DATA = "/root/reference/data/COD10K"
CKPT = os.path.join(REPO, "artifacts", "fidelity", "best_model.pth")

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow


@pytest.mark.skipif(not os.path.exists(CKPT), reason="fidelity ckpt missing")
@pytest.mark.skipif(not os.path.isdir(os.path.join(REF_DATA, "images")),
                    reason="COD10K mount missing")
def test_composed_mask_fidelity_two_images():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import jax
    import jax.numpy as jnp
    from reference_impl import RefRegionGraphGNN
    from reference_pipeline import build_reference_graph, reference_heatmap

    from camouflage_multimodal_tpu.api import load_rg_model
    from camouflage_multimodal_tpu.data.cod10k import load_image_rgb
    from camouflage_multimodal_tpu.pipeline import RegionGraphPipeline

    # The 50-image gate evaluated images beyond the 120-image train split;
    # take the first two of that held-out range.
    paths = sorted(glob.glob(os.path.join(REF_DATA, "images", "*.jpg")))[120:122]
    assert len(paths) == 2

    tmodel = RefRegionGraphGNN()
    tmodel.load_state_dict(torch.load(CKPT, weights_only=True))
    tmodel.eval()

    jmodel, variables = load_rg_model(CKPT)
    pipe = RegionGraphPipeline(jmodel, n_segments=500, image_size=256)

    for p in paths:
        img = load_image_rgb(p, 256)
        ref_graph = build_reference_graph(img, n_segments=500)
        heat_ref = reference_heatmap(tmodel, ref_graph, mapping="corrected")

        out = jax.device_get(pipe(
            variables,
            jnp.asarray((img[None] * 255.0).round().astype(np.uint8))))
        heat_jax = out["heatmap"][0]

        agree = float(((heat_ref > 0.5) == (heat_jax > 0.5)).mean())
        mae = float(np.abs(heat_ref - heat_jax).mean())
        assert agree >= 0.95, f"{os.path.basename(p)}: agreement {agree:.4f}"
        assert mae < 0.05, f"{os.path.basename(p)}: heatmap MAE {mae:.4f}"
