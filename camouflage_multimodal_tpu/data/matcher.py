"""RG ↔ KG embedding matcher.

Behavioral port of ``EmbeddingMatcher``
(``/root/reference/models/multimodal/embedding_matcher.py:17-179``):

* category↔id maps in KG-store insertion order,
* organism extraction from COD10K filename token 5 with exact-then-substring
  matching (:51-79),
* two modes — ``use_all_categories=True`` stacks all category vectors
  (cross-attention mode), else matched single category with a
  mean-of-all-categories fallback (:81-115),
* ``create_matched_dataset`` emitting the same record schema (:117-168).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from camouflage_multimodal_tpu.core.artifacts import (
    load_kg_embeddings,
    load_rg_embeddings,
)


class EmbeddingMatcher:
    def __init__(self, rg_embeddings_path: str, kg_embeddings_path: str,
                 category_mapping: Optional[Dict[str, str]] = None) -> None:
        self.rg_embeddings = load_rg_embeddings(rg_embeddings_path)
        self.kg_embeddings = load_kg_embeddings(kg_embeddings_path)
        self.category_mapping = category_mapping
        self.category_to_id = {cat: idx for idx, cat in enumerate(self.kg_embeddings.keys())}
        self.id_to_category = {idx: cat for cat, idx in self.category_to_id.items()}

    def extract_category_from_filename(self, filename: str) -> Optional[str]:
        """COD10K name token 5 → KG category (exact, then substring both ways)."""
        name = os.path.splitext(filename)[0]
        parts = name.split("-")
        if len(parts) >= 6:
            organism_name = parts[5]
            if organism_name in self.kg_embeddings:
                return organism_name
            for category in self.kg_embeddings.keys():
                if (organism_name.lower() in category.lower()
                        or category.lower() in organism_name.lower()):
                    return category
        return None

    def get_kg_embedding_for_image(self, image_name: str,
                                   use_all_categories: bool = False
                                   ) -> Tuple[np.ndarray, List[int]]:
        if use_all_categories:
            kg_emb = np.concatenate(list(self.kg_embeddings.values()), axis=0)
            return kg_emb, list(range(len(self.kg_embeddings)))

        if self.category_mapping and image_name in self.category_mapping:
            category = self.category_mapping[image_name]
        else:
            category = self.extract_category_from_filename(image_name)

        if category and category in self.kg_embeddings:
            return self.kg_embeddings[category].reshape(1, -1), [self.category_to_id[category]]
        # Fallback: mean over all categories (embedding_matcher.py:110-113)
        kg_emb = np.concatenate(list(self.kg_embeddings.values()), axis=0).mean(
            axis=0, keepdims=True
        )
        return kg_emb, [0]

    def create_matched_dataset(self, use_all_kg_categories: bool = True) -> List[Dict[str, Any]]:
        matched_data = []
        for image_name, rg_data in self.rg_embeddings.items():
            kg_emb, category_ids = self.get_kg_embedding_for_image(
                image_name, use_all_categories=use_all_kg_categories
            )
            matched_data.append({
                "image_name": image_name,
                "rg_node_embeddings": rg_data["node_embeddings"],
                "rg_graph_embedding": rg_data["graph_embedding"],
                "kg_embeddings": kg_emb,
                "category_ids": category_ids,
                "num_rg_nodes": rg_data["node_embeddings"].shape[0],
                "num_kg_categories": kg_emb.shape[0],
            })
        return matched_data

    def save_matched_dataset(self, output_path: str,
                             use_all_kg_categories: bool = True) -> List[Dict[str, Any]]:
        matched = self.create_matched_dataset(use_all_kg_categories)
        os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
        np.save(output_path, np.asarray(matched, dtype=object), allow_pickle=True)
        return matched


def build_ordered_kg_tensor(kg_embeddings: Dict[str, np.ndarray]):
    """Stable (sorted-by-category) stacking, mirroring
    ``test_multimodal.build_ordered_kg_tensor`` (:58-80).

    Returns (kg (num_kg, dim) float32, ordered dict category → embedding)."""
    ordered_keys = sorted(kg_embeddings.keys())
    ordered = {k: np.asarray(kg_embeddings[k], np.float32).reshape(-1) for k in ordered_keys}
    kg = np.stack([ordered[k] for k in ordered_keys])
    return kg, ordered
