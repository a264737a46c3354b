"""Round-trip tests for the torch→flax checkpoint transplanter
(core/torch_compat.py): torch reference models with freshly-saved
checkpoints must produce bit-close outputs through the flax models after
import (VERDICT r1 items 1/6).

The torch side is ``tools/reference_impl.py`` for the two PyG models
(dense PyG-math mirrors, reference state_dict key names) and the
reference's OWN ``fusion_model.py`` (plain torch, imported verbatim) for
the multimodal model.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from camouflage_multimodal_tpu.core.torch_compat import (  # noqa: E402
    detect_state_dict_kind,
    import_fusion_state_dict,
    import_kg_state_dict,
    import_rg_state_dict,
    load_torch_checkpoint,
)

from jithelp import japply, jcall  # noqa: E402

TOL = dict(rtol=2e-4, atol=2e-5)


def _random_dense_graph(rng, K, Cin):
    x = rng.standard_normal((K, Cin)).astype(np.float32)
    adj = np.zeros((K, K), np.float32)
    for _ in range(3 * K):
        i, j = rng.integers(0, K, 2)
        if i != j:
            w = float(rng.random()) + 0.1
            adj[i, j] = adj[j, i] = w
    return x, adj


def test_rg_state_dict_round_trip(rng):
    from camouflage_multimodal_tpu.models.region_graph import RegionGraphGNN
    from reference_impl import RefRegionGraphGNN

    torch.manual_seed(0)
    ref = RefRegionGraphGNN().eval()
    # Non-trivial BN running stats so the import actually exercises them.
    for bn in (ref.bn1, ref.bn2, ref.bn3, ref.bn4):
        bn.running_mean.uniform_(-0.5, 0.5)
        bn.running_var.uniform_(0.5, 2.0)

    K = 24
    x, adj = _random_dense_graph(rng, K, 15)
    with torch.no_grad():
        t_mask, t_inst, t_edge = ref(torch.tensor(x), torch.tensor(adj > 0).float(),
                                     torch.tensor(adj))
        t_nodes = ref.extract_node_embeddings(torch.tensor(x),
                                              torch.tensor(adj > 0).float(),
                                              torch.tensor(adj))

    variables = jax.tree_util.tree_map(jnp.asarray, import_rg_state_dict(ref.state_dict()))
    model = RegionGraphGNN()
    out = japply(model, variables, jnp.asarray(x)[None],
                 jnp.asarray(adj > 0)[None], jnp.asarray(adj)[None],
                 jnp.ones((1, K), bool))

    np.testing.assert_allclose(np.asarray(out["mask_logits"][0]), t_mask.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out["instance_logits"][0]), t_inst.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out["edge_logits"][0]), t_edge.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out["node_embeddings"][0]), t_nodes.numpy(), **TOL)


def test_rg_checkpoint_file_round_trip(rng, tmp_path):
    """Bare state_dict .pth — the reference RG generation (train.py:463)."""
    from camouflage_multimodal_tpu.models.region_graph import RegionGraphGNN
    from reference_impl import RefRegionGraphGNN

    torch.manual_seed(1)
    ref = RefRegionGraphGNN().eval()
    path = str(tmp_path / "region_graph_model.pth")
    torch.save(ref.state_dict(), path)

    variables, meta = load_torch_checkpoint(path)
    assert meta["kind"] == "region_graph"

    K = 8
    x, adj = _random_dense_graph(rng, K, 15)
    with torch.no_grad():
        t_mask, _, _ = ref(torch.tensor(x), torch.tensor(adj > 0).float(), torch.tensor(adj))
    out = japply(RegionGraphGNN(), variables, jnp.asarray(x)[None],
                 jnp.asarray(adj > 0)[None], jnp.asarray(adj)[None],
                 jnp.ones((1, K), bool))
    np.testing.assert_allclose(np.asarray(out["mask_logits"][0]), t_mask.numpy(), **TOL)


def test_kg_state_dict_round_trip(rng, tmp_path):
    from camouflage_multimodal_tpu.models.knowledge_graph import KnowledgeGraphGNN
    from reference_impl import RefKnowledgeGraphGNN

    torch.manual_seed(2)
    ref = RefKnowledgeGraphGNN().eval()
    for bn in (ref.bn1, ref.bn2, ref.bn3):
        bn.running_mean.uniform_(-0.5, 0.5)
        bn.running_var.uniform_(0.5, 2.0)

    K = 10
    x, adj = _random_dense_graph(rng, K, 32)
    adj = (adj > 0).astype(np.float32)  # KG graphs are unweighted (train_model.py:63)
    with torch.no_grad():
        t_score = ref(torch.tensor(x), torch.tensor(adj))
        t_emb = ref.get_embedding(torch.tensor(x), torch.tensor(adj))

    # KG generation: wrapped dict with embedding_dim (train_model.py:422-427).
    path = str(tmp_path / "kg_gnn_model.pth")
    torch.save({"model_state_dict": ref.state_dict(), "embedding_dim": 128,
                "val_loss": 0.1}, path)
    variables, meta = load_torch_checkpoint(path)
    assert meta["kind"] == "knowledge_graph" and meta["embedding_dim"] == 128

    out = japply(KnowledgeGraphGNN(), variables, jnp.asarray(x)[None],
                 jnp.asarray(adj > 0)[None], jnp.ones((1, K), bool))
    np.testing.assert_allclose(np.asarray(out["score"]), t_score.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out["embedding"]), t_emb.numpy(), **TOL)
    # sanity: direct state_dict import matches the file path
    direct = import_kg_state_dict(ref.state_dict())
    np.testing.assert_allclose(np.asarray(variables["params"]["gcn1_kernel"]),
                               direct["params"]["gcn1_kernel"])


@pytest.mark.parametrize("generation", ["old_val_acc", "new_f1"])
def test_fusion_checkpoint_round_trip_reference_module(rng, tmp_path, generation):
    """The reference's OWN fusion_model.py vs the flax model under
    transplanted weights — both checkpoint generations
    (test_multimodal.py:44-53)."""
    from camouflage_multimodal_tpu.models.fusion import build_multimodal_model
    from reference_impl import load_reference_fusion_module

    fusion_mod = load_reference_fusion_module()
    config = {"rg_dim": 128, "kg_dim": 128, "hidden_dim": 256, "num_heads": 8,
              "fusion_type": "cross_attention", "num_classes": 2, "dropout": 0.3}
    torch.manual_seed(3)
    ref = fusion_mod.build_multimodal_model(config).eval()

    extra = ({"val_acc": 81.2, "balanced_acc": 74.0} if generation == "old_val_acc"
             else {"val_f1_class_1": 0.61, "val_f1_avg": 0.58,
                   "val_acc_0": 55.0, "val_acc_1": 88.0})
    path = str(tmp_path / "multimodal_best.pth")
    torch.save({"epoch": 7, "model_state_dict": ref.state_dict(),
                "optimizer_state_dict": {}, "val_loss": 0.4,
                "config": {"model": config}, **extra}, path)

    variables, meta = load_torch_checkpoint(path)
    assert meta["kind"] == "fusion" and meta["epoch"] == 7
    assert set(extra).issubset(meta)

    B, Nrg, Nkg = 2, 40, 13
    rg = rng.standard_normal((B, Nrg, 128)).astype(np.float32)
    kg = rng.standard_normal((B, Nkg, 128)).astype(np.float32)
    with torch.no_grad():
        t_mask, t_inst, t_edge, t_score, t_attn = ref(
            torch.tensor(rg), torch.tensor(kg), return_attention=True)

    model = build_multimodal_model(config)
    out = japply(model, variables, jnp.asarray(rg), jnp.asarray(kg),
                 return_attention=True)
    np.testing.assert_allclose(np.asarray(out["mask_logits"]), t_mask.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out["instance_logits"]), t_inst.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out["edge_logits"]), t_edge.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out["score"]), t_score.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out["attention"]["rg2kg"]),
                               t_attn["rg2kg"].numpy(), **TOL)


def test_fusion_late_variant_round_trip(rng):
    from camouflage_multimodal_tpu.models.fusion import build_multimodal_model
    from reference_impl import load_reference_fusion_module

    fusion_mod = load_reference_fusion_module()
    config = {"fusion_type": "late", "hidden_dim": 256}
    torch.manual_seed(4)
    ref = fusion_mod.build_multimodal_model(config).eval()
    variables = jax.tree_util.tree_map(
        jnp.asarray, import_fusion_state_dict(ref.state_dict(), config))

    rg = rng.standard_normal((3, 20, 128)).astype(np.float32)
    kg = rng.standard_normal((3, 13, 128)).astype(np.float32)
    with torch.no_grad():
        t_out = ref(torch.tensor(rg), torch.tensor(kg))
    out = japply(build_multimodal_model(config), variables,
                 jnp.asarray(rg), jnp.asarray(kg))
    np.testing.assert_allclose(np.asarray(out["mask_logits"]), t_out[0].numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out["score"]), t_out[3].numpy(), **TOL)


def test_detect_kind():
    assert detect_state_dict_kind({"conv1.att_src": 0}) == "region_graph"
    assert detect_state_dict_kind({"embedding_layer.0.weight": 0}) == "knowledge_graph"
    assert detect_state_dict_kind({"mask_head.0.weight": 0, "fusion.ln_rg.weight": 0}) == "fusion"
    with pytest.raises(ValueError):
        detect_state_dict_kind({"something": 0})
