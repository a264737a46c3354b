#!/bin/bash
# Full-chain demo on real data: trained RG model → RG embeddings → KG ingest
# → KG train → KG embeddings → fusion train → batch multimodal inference.
set -e
cd /root/repo
REF=/root/reference

echo "=== [1/6] extract RG embeddings (256 images, trained model) ==="
python -m camouflage_multimodal_tpu.cli extract-rg \
  --model artifacts/rg_model.ckpt \
  --image-dir $REF/data/COD10K/images \
  --output artifacts/rg_embeddings --max-images 256 --batch-size 16

echo "=== [2/6] ingest full KG (6000 annotations) ==="
python -m camouflage_multimodal_tpu.cli ingest-kg \
  --annotations $REF/models/knowledge_graph/annotations \
  --output artifacts/kg_store.pkl \
  --processed-log artifacts/processed_files.txt

echo "=== [3/6] train KG GNN ==="
python -m camouflage_multimodal_tpu.cli train-kg \
  --store artifacts/kg_store.pkl --epochs 20 \
  --output artifacts/kg_gnn_model.ckpt

echo "=== [4/6] extract KG category embeddings ==="
python -m camouflage_multimodal_tpu.cli extract-kg \
  --model artifacts/kg_gnn_model.ckpt --store artifacts/kg_store.pkl \
  --output artifacts/kg_embeddings

echo "=== [5/6] train fusion ==="
cat > /tmp/fusion_config.yaml <<YAML
rg_embeddings_path: "artifacts/rg_embeddings/all_rg_embeddings.npz"
kg_embeddings_path: "artifacts/kg_embeddings/all_embeddings.npz"
mask_dir: "$REF/data/COD10K/gt_object"
instance_dir: "$REF/data/COD10K/gt_instance"
edge_dir: "$REF/data/COD10K/gt_edge"
checkpoint_dir: "artifacts/checkpoints"
epochs: 12
batch_size: 8
YAML
python -m camouflage_multimodal_tpu.cli train-fusion --config /tmp/fusion_config.yaml

echo "=== [6/6] batch multimodal inference on test images ==="
python -m camouflage_multimodal_tpu.cli test-multimodal \
  --checkpoint artifacts/checkpoints/multimodal_best_fixed.ckpt \
  --rg-model artifacts/rg_model.ckpt \
  --kg-embeddings artifacts/kg_embeddings/all_embeddings.npz \
  --image-dir $REF/test_images --max-images 8 --save-figures \
  --output artifacts/results
echo "=== DONE ==="
