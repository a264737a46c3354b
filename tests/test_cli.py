"""CLI smoke tests (mirrors the reference's argparse entry scripts)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.slow  # full pipelines / training on real images



def test_cli_ingest_kg(tmp_path):
    from camouflage_multimodal_tpu import cli
    from camouflage_multimodal_tpu.kg.store import CamouflageKnowledgeStore

    annot = os.path.join(REF, "models/knowledge_graph/annotations")
    if not os.path.isdir(annot):
        pytest.skip("annotations unavailable")
    # limit via a temp dir with a few annotation files symlinked
    small = tmp_path / "annot"
    small.mkdir()
    names = sorted(os.listdir(annot))[:40]
    for n in names:
        os.symlink(os.path.join(annot, n), small / n)

    out = tmp_path / "kg_store.pkl"
    log = tmp_path / "processed.txt"
    cli.main(["ingest-kg", "--annotations", str(small), "--output", str(out),
              "--processed-log", str(log)])
    assert out.exists()
    store = CamouflageKnowledgeStore.load(str(out))
    assert len(store.observations) == 40
    assert len(open(log).read().splitlines()) == 40


def test_cli_train_and_extract_kg(tmp_path):
    from camouflage_multimodal_tpu import cli
    from camouflage_multimodal_tpu.kg.store import CamouflageKnowledgeStore

    annot = os.path.join(REF, "models/knowledge_graph/annotations")
    if not os.path.isdir(annot):
        pytest.skip("annotations unavailable")
    store = CamouflageKnowledgeStore()
    store.ingest_directory(annot, max_files=80)
    store_path = tmp_path / "kg_store.pkl"
    store.save(str(store_path))

    model_path = tmp_path / "kg_model.ckpt"
    cli.main(["train-kg", "--store", str(store_path), "--epochs", "2",
              "--limit", "6", "--output", str(model_path)])
    assert model_path.exists()

    out_dir = tmp_path / "kg_embeddings"
    cli.main(["extract-kg", "--model", str(model_path), "--store", str(store_path),
              "--output", str(out_dir), "--limit", "4"])
    assert (out_dir / "all_embeddings.npz").exists()
    with open(out_dir / "summary.json") as f:
        summary = json.load(f)
    assert summary["num_categories"] >= 2
    assert summary["embedding_dim"] == 128
    assert (out_dir / "embedding_stats.json").exists()
