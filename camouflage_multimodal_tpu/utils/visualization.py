"""Host-side matplotlib visualization mirroring the reference figures
(``/root/reference/utils/visualization.py:11-126``)."""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def _savefig(output_path: str) -> None:
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    plt.savefig(output_path, dpi=150, bbox_inches="tight")
    plt.close()


def plot_training_history(history, output_path):
    """Loss + accuracy curves (reference visualization.py:11-40)."""
    fig, axes = plt.subplots(1, 2, figsize=(15, 5))
    epochs = range(1, len(history["train_loss"]) + 1)

    axes[0].plot(epochs, history["train_loss"], "b-", label="Train Loss", linewidth=2)
    axes[0].plot(epochs, history["val_loss"], "r-", label="Val Loss", linewidth=2)
    axes[0].set_xlabel("Epoch", fontsize=12)
    axes[0].set_ylabel("Loss", fontsize=12)
    axes[0].set_title("Training and Validation Loss", fontsize=14, fontweight="bold")
    axes[0].legend()
    axes[0].grid(alpha=0.3)

    acc_keys = ("train_acc", "val_acc") if "train_acc" in history else ("train_f1_class_1", "val_f1_class_1")
    if acc_keys[0] in history:
        axes[1].plot(epochs, history[acc_keys[0]], "b-", label=acc_keys[0], linewidth=2)
        axes[1].plot(epochs, history[acc_keys[1]], "r-", label=acc_keys[1], linewidth=2)
        axes[1].set_xlabel("Epoch", fontsize=12)
        axes[1].set_title("Training and Validation Metric", fontsize=14, fontweight="bold")
        axes[1].legend()
        axes[1].grid(alpha=0.3)

    plt.tight_layout()
    _savefig(output_path)


def plot_attention_heatmap(attention_weights, categories, output_path):
    """RG→KG attention heatmap (reference visualization.py:42-62)."""
    attention_weights = np.asarray(attention_weights)
    fig, ax = plt.subplots(figsize=(12, 8))
    im = ax.imshow(attention_weights, cmap="hot", aspect="auto")
    ax.set_xlabel("KG Categories", fontsize=12)
    ax.set_ylabel("RG Nodes (Regions)", fontsize=12)
    ax.set_title("Cross-Attention: RG → KG", fontsize=14, fontweight="bold")
    if len(categories) <= 20:
        ax.set_xticks(range(len(categories)))
        ax.set_xticklabels(categories, rotation=45, ha="right", fontsize=8)
    plt.colorbar(im, ax=ax, label="Attention Weight")
    plt.tight_layout()
    _savefig(output_path)


def plot_comparison(image, pred_mask, gt_mask, output_path):
    """Image / GT / prediction / overlay strip (reference visualization.py:64-90)."""
    fig, axes = plt.subplots(1, 4, figsize=(20, 5))
    axes[0].imshow(np.asarray(image))
    axes[0].set_title("Original Image", fontweight="bold")
    axes[1].imshow(np.asarray(gt_mask), cmap="gray")
    axes[1].set_title("Ground Truth", fontweight="bold")
    axes[2].imshow(np.asarray(pred_mask), cmap="gray")
    axes[2].set_title("Prediction", fontweight="bold")
    axes[3].imshow(np.asarray(image))
    axes[3].imshow(np.asarray(pred_mask), alpha=0.5, cmap="hot")
    axes[3].set_title("Prediction Overlay", fontweight="bold")
    for ax in axes:
        ax.axis("off")
    plt.tight_layout()
    _savefig(output_path)


def plot_metrics_summary(metrics_dict, output_path):
    """Color-banded metrics bar chart (reference visualization.py:92-126)."""
    fig, ax = plt.subplots(figsize=(10, 6))
    metrics = list(metrics_dict.keys())
    values = [float(v) for v in metrics_dict.values()]
    bars = ax.bar(metrics, values, color="skyblue", edgecolor="black", linewidth=1.5)
    for bar, val in zip(bars, values):
        if val > 0.8:
            bar.set_color("green")
        elif val > 0.6:
            bar.set_color("orange")
        else:
            bar.set_color("red")
    ax.set_ylabel("Score", fontsize=12)
    ax.set_title("Evaluation Metrics", fontsize=14, fontweight="bold")
    ax.set_ylim([0, 1])
    ax.grid(axis="y", alpha=0.3)
    for bar, val in zip(bars, values):
        ax.text(bar.get_x() + bar.get_width() / 2.0, bar.get_height(), f"{val:.3f}",
                ha="center", va="bottom", fontweight="bold")
    plt.xticks(rotation=45, ha="right")
    plt.tight_layout()
    _savefig(output_path)
