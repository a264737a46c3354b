"""Knowledge-graph store + featurizer tests against the real reference
annotations and the shipped KG artifact metadata."""

import json
import os

import numpy as np
import pytest

from camouflage_multimodal_tpu.kg import (
    CamouflageKnowledgeStore,
    build_subgraph,
    extract_structured,
    pad_subgraphs,
)
from camouflage_multimodal_tpu.kg.featurize import FEATURE_DIM, NODE_TYPES

ANNOT_DIR = "/root/reference/models/knowledge_graph/annotations"
KG_SUMMARY = "/root/reference/models/knowledge_graph/kg_embeddings/summary.json"


@pytest.fixture(scope="module")
def small_store():
    if not os.path.isdir(ANNOT_DIR):
        pytest.skip("reference annotations unavailable")
    store = CamouflageKnowledgeStore()
    ok, failed = store.ingest_directory(ANNOT_DIR, max_files=300)
    assert failed == 0 and ok == 300
    return store


def test_extract_structured_known_annotation():
    path = os.path.join(ANNOT_DIR, "COD10K-CAM-3-Flying-61-Katydid-4058_annotation.json")
    if not os.path.exists(path):
        pytest.skip("annotation missing")
    with open(path) as f:
        obj = json.load(f)
    rec = extract_structured(obj, os.path.basename(path))
    assert rec["organism_name"] == "Katydid"
    assert rec["category"] == "Insect"
    assert rec["is_camouflaged"] is True
    assert rec["camouflage_score"] == pytest.approx(0.9)
    assert rec["color_similarity"] == pytest.approx(0.8)   # "high"
    assert rec["contrast_difference"] == pytest.approx(0.2)  # "low"
    assert rec["environment_type"] == "terrestrial-forest"
    assert "green" in rec["organism_colors"]
    assert rec["pattern"] == "mimicry"  # not in PATTERN_MAPPING → lowercased


def test_store_categories_subset_of_reference(small_store):
    """Categories found must be drawn from the 13 the reference extracted
    (kg_embeddings/summary.json)."""
    with open(KG_SUMMARY) as f:
        ref_categories = set(json.load(f)["categories"])
    got = dict(small_store.categories())
    assert got, "no categories ingested"
    unknown = set(got) - ref_categories - {"Unknown"}
    assert not unknown, f"unexpected categories: {unknown}"
    # counts ordered desc
    counts = list(got.values())
    assert counts == sorted(counts, reverse=True)


def test_subgraph_extraction_and_featurization(small_store):
    cat = small_store.categories()[0][0]
    records = small_store.extract_category_subgraphs(cat, limit=10)
    assert 0 < len(records) <= 10
    sg = build_subgraph(records[0])
    x, edges, y = sg["x"], sg["edges"], sg["y"]
    assert x.shape[1] == FEATURE_DIM
    assert x.shape[0] >= 5  # core path nodes
    # Node 0 = Organism one-hot; node 3 = CamouflageAssessment with numerics
    assert x[0, NODE_TYPES.index("Organism")] == 1.0
    ca_row = x[3]
    assert ca_row[NODE_TYPES.index("CamouflageAssessment")] == 1.0
    assert ca_row[9] == pytest.approx(y)
    # Edges reference valid nodes, core path edges present
    assert (1, 0) in edges and (1, 2) in edges and (2, 3) in edges and (3, 4) in edges
    for s, d in edges:
        assert 0 <= s < x.shape[0] and 0 <= d < x.shape[0]


def test_pad_subgraphs_shapes(small_store):
    cat = small_store.categories()[0][0]
    records = small_store.extract_category_subgraphs(cat, limit=8)
    sgs = [build_subgraph(r) for r in records]
    x, adj, mask, y, truncated = pad_subgraphs(sgs, max_nodes=64)
    B = len(sgs)
    assert x.shape == (B, 64, FEATURE_DIM)
    assert adj.shape == (B, 64, 64)
    assert mask.shape == (B, 64)
    assert truncated == 0
    # adjacency symmetric, only among valid nodes
    assert (adj == adj.transpose(0, 2, 1)).all()
    assert not adj[~np.broadcast_to(mask[:, :, None] & mask[:, None, :], adj.shape)].any()


def test_store_ingest_resumable(tmp_path, small_store):
    log = tmp_path / "processed.txt"
    s1 = CamouflageKnowledgeStore()
    s1.ingest_directory(ANNOT_DIR, processed_log=str(log), max_files=50)
    n_obs = len(s1.observations)
    # Resume: second call skips already-processed files
    s2_added, _ = s1.ingest_directory(ANNOT_DIR, processed_log=str(log), max_files=50)
    assert s2_added == 50  # next 50 files
    assert len(s1.observations) == n_obs + 50


def test_store_save_load_roundtrip(tmp_path, small_store):
    p = tmp_path / "store.pkl"
    small_store.save(str(p))
    loaded = CamouflageKnowledgeStore.load(str(p))
    assert loaded.categories() == small_store.categories()
    cat = loaded.categories()[0][0]
    a = loaded.extract_category_subgraphs(cat, limit=3)
    b = small_store.extract_category_subgraphs(cat, limit=3)
    assert a == b


def test_organism_accumulates_satellites():
    """MERGE semantics: the same organism accumulates colors across files."""
    store = CamouflageKnowledgeStore()
    base = {
        "object_name": "TestFish", "object_category": "Fish",
        "camouflage_presence": "Camouflage", "camouflage_score": 0.5,
        "confidence": 1.0, "camouflage_type": "Mimicry",
        "color_similarity": "high", "texture_similarity": "low",
        "contrast_difference": "medium",
    }
    store.ingest_annotation({**base, "explanation": "a green fish",
                             "background_description": "blue underwater reef"}, "f1.json")
    store.ingest_annotation({**base, "explanation": "a brown fish",
                             "background_description": "yellow sandy seabed"}, "f2.json")
    org = store.organisms["TestFish"]
    assert "green" in org["colors"] and "brown" in org["colors"]
    recs = store.extract_category_subgraphs("Fish", limit=10)
    assert len(recs) == 2
    # both records carry the accumulated organism colors
    for r in recs:
        assert set(["green", "brown"]).issubset(set(r["org_colors"]))
    # but per-record environment colors differ
    assert recs[0]["env_colors"] != recs[1]["env_colors"]
