"""Small-unit coverage: config, checkpoint, profiling, artifacts, misc."""

import json
import os
import time

import numpy as np
import pytest

import jax.numpy as jnp


def test_load_config_overrides(tmp_path):
    from camouflage_multimodal_tpu.core.config import default_config, load_config

    p = tmp_path / "cfg.yaml"
    p.write_text("learning_rate: 0.001\nmodel:\n  hidden_dim: 128\n")
    cfg = load_config(str(p))
    assert cfg["learning_rate"] == 0.001
    assert cfg["model"]["hidden_dim"] == 128
    # untouched defaults survive the deep update
    assert cfg["model"]["num_heads"] == default_config()["model"]["num_heads"]
    assert cfg["task_weights"]["mask"] == 3.0


def test_checkpoint_roundtrip(tmp_path):
    from camouflage_multimodal_tpu.core.checkpoint import load_checkpoint, save_checkpoint

    payload = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "epoch": 7,
        "val_loss": 0.25,
        "config": {"model": {"hidden_dim": 256}},
    }
    p = str(tmp_path / "ckpt.pkl")
    save_checkpoint(p, payload)
    loaded = load_checkpoint(p)
    np.testing.assert_array_equal(loaded["params"]["w"], np.arange(6.0).reshape(2, 3))
    assert loaded["epoch"] == 7
    assert loaded["config"]["model"]["hidden_dim"] == 256


def test_checkpoint_durable_format_and_legacy(tmp_path):
    """r4 checkpoints are module-path-free npz+JSON (VERDICT r3 item 8):
    optax namedtuple states restore into a caller template, legacy pickle
    blobs keep loading, and the format is detectable."""
    import pickle

    import jax
    import optax
    from flax import serialization

    from camouflage_multimodal_tpu.core.checkpoint import (
        _restate, checkpoint_format, load_checkpoint, save_checkpoint)

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    opt = tx.init(params)
    g = np.random.default_rng(7)
    g.random(3)
    payload = {"opt_state": opt, "best_val": float("inf"),
               "numpy_rng_state": g.bit_generator.state,
               "history": {"loss": [1.0, 0.5]}, "name": "kg"}
    p = str(tmp_path / "x.ckpt")
    save_checkpoint(p, payload)
    assert checkpoint_format(p) == "npz"
    # the file is a plain zip of .npy entries — no pickled objects at all
    blob = load_checkpoint(p)
    assert blob["best_val"] == float("inf") and blob["name"] == "kg"
    assert blob["history"]["loss"] == [1.0, 0.5]          # list stays list
    assert blob["numpy_rng_state"] == g.bit_generator.state  # 128-bit ints
    rec = serialization.from_state_dict(tx.init(params),
                                        _restate(blob["opt_state"]))
    for a, b in zip(jax.tree_util.tree_leaves(rec),
                    jax.tree_util.tree_leaves(opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    legacy = str(tmp_path / "old.ckpt")
    with open(legacy, "wb") as f:
        pickle.dump({"epoch": 3}, f)
    assert checkpoint_format(legacy) == "pickle"
    assert load_checkpoint(legacy)["epoch"] == 3


def test_rg_embedding_artifacts_roundtrip(tmp_path):
    from camouflage_multimodal_tpu.core.artifacts import (
        load_rg_embeddings,
        save_rg_embeddings,
    )

    rng = np.random.default_rng(0)
    store = {
        "a.jpg": {"node_embeddings": rng.random((10, 128)).astype(np.float32),
                  "graph_embedding": rng.random((1, 128)).astype(np.float32)},
        "b.jpg": {"node_embeddings": rng.random((7, 128)).astype(np.float32),
                  "graph_embedding": rng.random((1, 128)).astype(np.float32)},
    }
    p = str(tmp_path / "rg.npz")
    save_rg_embeddings(p, store)
    loaded = load_rg_embeddings(p)
    assert set(loaded) == {"a.jpg", "b.jpg"}
    np.testing.assert_allclose(loaded["a.jpg"]["node_embeddings"],
                               store["a.jpg"]["node_embeddings"])
    assert loaded["b.jpg"]["num_nodes"] == 7


def test_kg_embedding_artifacts_and_reference_pt(tmp_path):
    from camouflage_multimodal_tpu.core.artifacts import (
        load_kg_embeddings,
        save_kg_embeddings,
    )

    store = {"Fish": np.ones((1, 128), np.float32), "Bird": np.zeros((1, 128), np.float32)}
    p = str(tmp_path / "kg.npz")
    save_kg_embeddings(p, store)
    loaded = load_kg_embeddings(p)
    assert set(loaded) == {"Fish", "Bird"}

    # The reference's actual shipped artifact loads through the .pt path.
    ref_pt = "/root/reference/models/knowledge_graph/kg_embeddings/all_embeddings.pt"
    if os.path.exists(ref_pt):
        ref = load_kg_embeddings(ref_pt)
        assert len(ref) == 13
        for v in ref.values():
            assert v.shape == (1, 128)


def test_stage_timer(tmp_path):
    from camouflage_multimodal_tpu.core.profiling import StageTimer

    t = StageTimer()
    with t.stage("decode"):
        time.sleep(0.01)
    with t.stage("decode"):
        time.sleep(0.01)
    with t.stage("compute"):
        pass
    s = t.summary()
    assert s["decode"]["count"] == 2
    assert s["decode"]["total_seconds"] >= 0.02
    p = str(tmp_path / "prof.json")
    t.save(p)
    assert json.load(open(p))["compute"]["count"] == 1


def test_global_batch_indices_partition():
    from camouflage_multimodal_tpu.parallel.distributed import global_batch_indices

    idx = global_batch_indices(10)
    assert len(idx) == 10  # single process owns everything
    shuffled = global_batch_indices(10, shuffle_seed=1)
    assert sorted(shuffled.tolist()) == list(range(10))


def test_parse_cod10k_name():
    from camouflage_multimodal_tpu.data.cod10k import parse_cod10k_name

    f = parse_cod10k_name("COD10K-CAM-1-Aquatic-1-BatFish-1.jpg")
    assert f["cam"] == "CAM"
    assert f["environment"] == "Aquatic"
    assert f["organism"] == "BatFish"
    g = parse_cod10k_name("COD10K-NonCAM-4-Terrestial-2692.png")
    assert g["cam"] == "NonCAM"
    assert g["organism"] is None


def test_label_heuristic_matches_cv2_reference(sample_quadruple):
    """The cv2 path vs the reference decision logic on a real GT mask."""
    import cv2

    from camouflage_multimodal_tpu.data.labels import extract_label_from_mask

    _, mask_path, _, _ = sample_quadruple
    label, conf = extract_label_from_mask(mask_path)

    # recompute with the reference's exact steps
    mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
    mask_norm = mask.astype(float) / 255.0
    mean_intensity = mask_norm.mean()
    non_zero_ratio = (mask > 10).sum() / mask.size
    edges = cv2.Canny(mask, 50, 150)
    edge_ratio = (edges > 0).sum() / mask.size
    _, binary = cv2.threshold(mask, 10, 255, cv2.THRESH_BINARY)
    contours, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if mean_intensity > 0.1 and non_zero_ratio > 0.05:
        exp_label = 1
        exp_conf = min(mean_intensity * 2, 1.0) if (edge_ratio < 0.02 or len(contours) > 10) else mean_intensity
    else:
        exp_label = 0
        exp_conf = 1.0 - mean_intensity
    assert label == exp_label
    assert conf == pytest.approx(exp_conf, abs=1e-9)
