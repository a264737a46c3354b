"""Full-workflow integration test on real COD10K data (tiny subsets):

RG extraction → embedding store → KG store/trainer → category embeddings →
matcher → fusion dataset/trainer → multimodal predictor → detect API.
Mirrors the reference's end-to-end usage (SURVEY.md §3 call stacks).
"""

import base64
import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.slow  # full pipelines / training on real images

N_IMAGES = 6
IMG_SIZE = 96
N_SEG = 64
MAX_NODES = 128


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("e2e")


@pytest.fixture(scope="module")
def rg_setup(workdir):
    """Random-weight RG model + pipeline + checkpoint."""
    from camouflage_multimodal_tpu.core.checkpoint import save_checkpoint
    from camouflage_multimodal_tpu.models.region_graph import RegionGraphGNN
    from camouflage_multimodal_tpu.pipeline import RegionGraphPipeline

    model = RegionGraphGNN()
    pipe = RegionGraphPipeline(model, n_segments=N_SEG, image_size=IMG_SIZE,
                               max_nodes=MAX_NODES, slic_iters=4)
    K = MAX_NODES
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, K, 15)),
                           jnp.zeros((1, K, K), bool), jnp.zeros((1, K, K)),
                           jnp.ones((1, K), bool))
    ckpt = str(workdir / "rg_model.ckpt")
    save_checkpoint(ckpt, {"params": variables["params"],
                           "batch_stats": variables["batch_stats"],
                           "model_config": {}})
    return model, pipe, variables, ckpt


@pytest.fixture(scope="module")
def rg_store(workdir, rg_setup):
    from camouflage_multimodal_tpu.extract import batch_extract_embeddings

    _, pipe, variables, _ = rg_setup
    img_dir = os.path.join(REF, "data/COD10K/images")
    if not os.path.isdir(img_dir):
        pytest.skip("reference data unavailable")
    out_dir = str(workdir / "rg_embeddings")
    store, summary = batch_extract_embeddings(pipe, variables, img_dir, out_dir,
                                              max_images=N_IMAGES, batch_size=3,
                                              log_fn=lambda *_: None)
    assert summary["processing_time"]["successful_images"] == N_IMAGES
    return os.path.join(out_dir, "all_rg_embeddings.npz")


@pytest.fixture(scope="module")
def kg_store_path(workdir):
    from camouflage_multimodal_tpu.core.artifacts import save_kg_embeddings
    from camouflage_multimodal_tpu.kg.store import CamouflageKnowledgeStore
    from camouflage_multimodal_tpu.train.train_kg import KGTrainer, create_dataset_from_store

    annot = os.path.join(REF, "models/knowledge_graph/annotations")
    if not os.path.isdir(annot):
        pytest.skip("annotations unavailable")
    store = CamouflageKnowledgeStore()
    store.ingest_directory(annot, max_files=150)
    trainer = KGTrainer(max_nodes=64)
    subgraphs = create_dataset_from_store(store, limit_per_category=8)
    state, _ = trainer.fit(subgraphs, epochs=2, batch_size=16,
                           checkpoint_path=None, log_fn=lambda *_: None)
    embeddings, _ = trainer.batch_extract_embeddings(state, store, limit=5)
    path = str(workdir / "all_embeddings.npz")
    save_kg_embeddings(path, embeddings)
    return path


def test_rg_embedding_store_roundtrip(rg_store):
    from camouflage_multimodal_tpu.core.artifacts import load_rg_embeddings

    store = load_rg_embeddings(rg_store)
    assert len(store) == N_IMAGES
    for name, rec in store.items():
        assert rec["node_embeddings"].shape[1] == 128
        assert rec["graph_embedding"].shape == (1, 128)
        assert rec["num_nodes"] > 10


def test_extraction_tolerates_failed_decodes(rg_setup, workdir, tmp_path):
    """Per-item fault tolerance through the 4-stage extraction pipeline
    (reference behavior: extract_rg_embeddings.py:415-422 records failures
    and continues). One chunk is made ENTIRELY undecodable so the loop also
    exercises the dev_batch-is-None skip path between pipeline stages."""
    from camouflage_multimodal_tpu.extract import batch_extract_embeddings

    _, pipe, variables, _ = rg_setup
    img_dir = os.path.join(REF, "data/COD10K/images")
    if not os.path.isdir(img_dir):
        pytest.skip("reference data unavailable")
    src = sorted(glob.glob(os.path.join(img_dir, "*.jpg")))[:4]
    d = tmp_path / "imgs"
    d.mkdir()
    import shutil

    # names sort so the two corrupt files form the complete middle chunk
    # (batch_size=2): [a_ok, b_ok] [c_bad, d_bad] [e_ok, f_ok]
    for i, p in enumerate(src):
        shutil.copy(p, d / f"{chr(97 + i) if i < 2 else chr(99 + i)}_ok.jpg")
    (d / "c_bad.jpg").write_bytes(b"\xff\xd8not a real jpeg")
    (d / "d_bad.jpg").write_bytes(b"")
    out_dir = str(workdir / "rg_embeddings_faulty")
    store, summary = batch_extract_embeddings(pipe, variables, str(d), out_dir,
                                              batch_size=2,
                                              log_fn=lambda *_: None)
    pt = summary["processing_time"]
    assert pt["successful_images"] == 4
    assert pt["failed_images"] == 2
    assert len(store) == 4
    assert all(k.endswith("_ok.jpg") for k in store)


def test_matcher_and_fusion_training(rg_store, kg_store_path, workdir):
    from camouflage_multimodal_tpu.data.matcher import EmbeddingMatcher
    from camouflage_multimodal_tpu.train.train_fusion import FusionDataset, FusionTrainer

    matcher = EmbeddingMatcher(rg_store, kg_store_path)
    matched = matcher.create_matched_dataset(use_all_kg_categories=True)
    assert len(matched) == N_IMAGES
    n_kg = matched[0]["kg_embeddings"].shape[0]
    assert n_kg == len(matcher.kg_embeddings)

    dataset = FusionDataset(matched, os.path.join(REF, "data/COD10K/gt_object"),
                            os.path.join(REF, "data/COD10K/gt_instance"),
                            os.path.join(REF, "data/COD10K/gt_edge"),
                            max_rg_nodes=MAX_NODES, augment=True)
    assert len(dataset) == N_IMAGES
    weights = dataset.get_aggressive_sample_weights()
    assert len(weights) == N_IMAGES and all(w > 0 for w in weights)

    trainer = FusionTrainer(model_config={"hidden_dim": 64, "num_heads": 4})
    ckpt_dir = str(workdir / "ckpts")
    os.makedirs(ckpt_dir, exist_ok=True)
    state, history = trainer.fit(dataset, epochs=2, batch_size=3,
                                 checkpoint_dir=ckpt_dir, log_fn=lambda *_: None)
    assert len(history["train_loss"]) == 2
    assert os.path.exists(os.path.join(ckpt_dir, "training_history_fixed.json"))


def test_matcher_single_category_mode(rg_store, kg_store_path):
    from camouflage_multimodal_tpu.data.matcher import EmbeddingMatcher

    matcher = EmbeddingMatcher(rg_store, kg_store_path)
    matched = matcher.create_matched_dataset(use_all_kg_categories=False)
    for rec in matched:
        assert rec["kg_embeddings"].shape[0] == 1  # single or mean fallback


def test_detect_api(rg_setup, workdir, sample_image_paths):
    from camouflage_multimodal_tpu.api import detect_camouflage
    from camouflage_multimodal_tpu.pipeline import RegionGraphPipeline

    model, pipe, variables, ckpt = rg_setup
    base = os.path.splitext(os.path.basename(sample_image_paths[0]))[0]
    gt = os.path.join(REF, "data/COD10K/gt_object", base + ".png")
    heatmap, mean_score, classification, metrics = detect_camouflage(
        sample_image_paths[0], ckpt, output_dir=str(workdir / "results"),
        mask_path=gt, n_segments=N_SEG, pipeline=pipe, variables=variables)
    assert heatmap.shape == (IMG_SIZE, IMG_SIZE)
    assert classification in ("HIGHLY CAMOUFLAGED", "MODERATELY CAMOUFLAGED",
                              "SLIGHTLY CAMOUFLAGED", "NOT CAMOUFLAGED")
    assert metrics is not None and 0.0 <= metrics["iou"] <= 1.0
    assert os.path.exists(str(workdir / "results" / f"detection_{os.path.basename(sample_image_paths[0])}"))


def test_evaluate_directory_pipelined(rg_setup, tmp_path):
    """Batched directory eval through the 4-stage decode∥upload∥compute∥
    download loop: partial final batch, one image without GT (skipped), and
    a sane metric dict (reference contract: region_graph/test.py:274-300
    metrics computed over every GT-paired image)."""
    import shutil

    from camouflage_multimodal_tpu.api import evaluate_directory

    _, _, _, ckpt = rg_setup
    img_src = os.path.join(REF, "data/COD10K/images")
    gt_src = os.path.join(REF, "data/COD10K/gt_object")
    if not os.path.isdir(img_src):
        pytest.skip("reference data unavailable")
    imgs = sorted(glob.glob(os.path.join(img_src, "*.jpg")))[:6]
    d_img, d_gt = tmp_path / "img", tmp_path / "gt"
    d_img.mkdir(), d_gt.mkdir()
    for i, p in enumerate(imgs):
        shutil.copy(p, d_img / os.path.basename(p))
        if i != 3:  # drop one GT -> that image must be skipped, not crash
            base = os.path.splitext(os.path.basename(p))[0] + ".png"
            shutil.copy(os.path.join(gt_src, base), d_gt / base)
    report = evaluate_directory(ckpt, str(d_img), str(d_gt),
                                n_segments=N_SEG, batch_size=4)
    for key in ("iou", "dice", "f1", "mae", "s_measure", "e_measure",
                "e_adaptive", "f_adaptive"):
        assert key in report and np.isfinite(report[key])
    assert 0.0 <= report["iou"] <= 1.0
    assert 0.0 <= report["mae"] <= 1.0


def test_native_loader_matches_pil(sample_image_paths):
    from camouflage_multimodal_tpu import native
    from camouflage_multimodal_tpu.data.cod10k import load_image_rgb, load_mask

    if not native.available():
        pytest.skip("native toolchain unavailable")
    p = sample_image_paths[0]
    a = native.load_image(p, 256)
    b = load_image_rgb(p, 256)
    # The fixed-point resample is Pillow's own algorithm: bit-exact.
    assert np.abs(a - b).max() == 0.0

    base = os.path.splitext(os.path.basename(p))[0]
    gt = os.path.join(REF, "data/COD10K/gt_object", base + ".png")
    if os.path.exists(gt):
        am = native.load_image(gt, 256, gray=True)
        bm = load_mask(gt, 256)
        np.testing.assert_allclose(am, bm, atol=0.0)

    batch, ok = native.load_batch(sample_image_paths[:2], 128)
    assert batch.shape == (2, 128, 128, 3) and ok.all()

    # Draft mode: DCT-scaled JPEG decode — close to the exact chain but not
    # identical (PNG masks are unaffected by the flag).
    exact, ok1 = native.load_batch_u8(sample_image_paths[:2], 256)
    draft, ok2 = native.load_batch_u8(sample_image_paths[:2], 256, draft=True)
    assert ok1.all() and ok2.all()
    mae = np.abs(exact.astype(int) - draft.astype(int)).mean()
    assert mae < 8.0, f"draft decode drifted too far from exact: MAE {mae}"
    if os.path.exists(gt):
        g1, _ = native.load_batch_u8([gt], 256, gray=True)
        g2, _ = native.load_batch_u8([gt], 256, gray=True, draft=True)
        assert np.array_equal(g1, g2)


def test_multimodal_predictor_end_to_end(rg_setup, rg_store, kg_store_path, workdir):
    """Fusion checkpoint → MultimodalPredictor → single-image prediction
    dict with the reference's keys (test_multimodal.py:141-150)."""
    from camouflage_multimodal_tpu.api import MultimodalPredictor
    from camouflage_multimodal_tpu.data.matcher import EmbeddingMatcher
    from camouflage_multimodal_tpu.train.train_fusion import FusionDataset, FusionTrainer

    matcher = EmbeddingMatcher(rg_store, kg_store_path)
    matched = matcher.create_matched_dataset(use_all_kg_categories=True)
    dataset = FusionDataset(matched, os.path.join(REF, "data/COD10K/gt_object"),
                            os.path.join(REF, "data/COD10K/gt_instance"),
                            os.path.join(REF, "data/COD10K/gt_edge"),
                            max_rg_nodes=MAX_NODES)
    model_cfg = {"hidden_dim": 64, "num_heads": 4}
    trainer = FusionTrainer(model_config=model_cfg)
    ckpt_dir = str(workdir / "pred_ckpts")
    os.makedirs(ckpt_dir, exist_ok=True)
    trainer.fit(dataset, epochs=1, batch_size=3, checkpoint_dir=ckpt_dir,
                config={"model": model_cfg}, log_fn=lambda *_: None)

    _, _, _, rg_ckpt = rg_setup
    predictor = MultimodalPredictor(
        os.path.join(ckpt_dir, "multimodal_best_fixed.ckpt"), rg_ckpt,
        kg_store_path, n_segments=N_SEG)
    # match the tiny fixture pipeline geometry
    from camouflage_multimodal_tpu.pipeline import MultimodalPipeline, RegionGraphPipeline

    predictor.rg_pipeline = RegionGraphPipeline(
        predictor.rg_pipeline.model, n_segments=N_SEG, image_size=IMG_SIZE,
        max_nodes=MAX_NODES, slic_iters=4)
    predictor.pipeline = MultimodalPipeline(predictor.rg_pipeline,
                                            predictor.fusion_model)

    img_path = sorted(glob.glob(os.path.join(REF, "data/COD10K/images/*.jpg")))[0]
    predictions, attn, kg_ordered = predictor.predict_single_image(img_path)
    for key in ("mask_logits", "mask_prob", "mask_pred", "instance_prob",
                "instance_pred", "edge_prob", "score", "segments"):
        assert key in predictions, key
    assert predictions["mask_pred"] in (0, 1)
    assert 0.0 <= predictions["score"] <= 1.0
    assert attn["rg2kg"].shape[1] == len(kg_ordered)
    np.testing.assert_allclose(np.asarray(predictions["mask_prob"]).sum(), 1.0,
                               atol=1e-5)

    # Full-stack serving round-trip over the same predictor: HTTP bytes in,
    # reference-schema JSON out, one fixed-shape batch program underneath
    # (serve.py; machinery unit tests live in test_serve.py).
    import io
    import json as _json
    import threading
    import urllib.request
    from PIL import Image

    from camouflage_multimodal_tpu.serve import InferenceService, make_server

    service = InferenceService(predictor, batch_size=2, max_wait_ms=1.0)
    server = make_server(service, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        with open(img_path, "rb") as f:
            body = f.read()
        req = urllib.request.Request(url + "/predict?heatmap=1", data=body,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            resp = _json.loads(r.read())
        assert resp["mask_pred"] == predictions["mask_pred"]
        np.testing.assert_allclose(resp["score"], predictions["score"],
                                   atol=1e-5)
        assert resp["classification"]
        png = base64.b64decode(resp["heatmap_png_base64"])
        heat = np.asarray(Image.open(io.BytesIO(png)))
        assert heat.shape == (IMG_SIZE, IMG_SIZE)
    finally:
        server.shutdown()
        service.close()
