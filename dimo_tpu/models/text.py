"""Text conditioning: BERT sentence embeddings + MLP latent projector.

Parity with the reference `src/text_embs.py`: pooled bert-base-cased
embeddings (max 25 tokens) projected 768 -> latent_dim by a single Linear
(`MLPEncoder` with num_layers=1). BERT runs host-side through transformers
(torch-cpu) — it is a test-time-only path; precomputed embeddings can be
passed instead when the BERT weights aren't cached locally (zero-egress envs).
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp


def get_motion_embs(descriptions: list[str], max_word_len: int = 25) -> np.ndarray:
    """Pooled BERT embeddings (B, 768). Requires bert-base-cased weights
    available to transformers (cached or local)."""
    from transformers import AutoModel, AutoTokenizer

    tz = AutoTokenizer.from_pretrained("bert-base-cased")
    model = AutoModel.from_pretrained("bert-base-cased")
    tokens = tz(text=descriptions, add_special_tokens=True,
                max_length=max_word_len, padding="max_length",
                return_attention_mask=True, return_tensors="pt")
    out = model(tokens["input_ids"], tokens["attention_mask"])["pooler_output"]
    return out.detach().numpy()


class MLPProjector:
    """768 -> latent_dim linear projector (weights from the reference's
    mlp_encoder.pth or a native .npz)."""

    def __init__(self, weight: jnp.ndarray, bias: jnp.ndarray):
        self.weight = weight      # (768, latent_dim)
        self.bias = bias          # (latent_dim,)

    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        return emb @ self.weight + self.bias


def load_mlp_projector(path: str, latent_dim: int = 32) -> MLPProjector:
    """Load the projector; .npz native, .pth torch-interop. The reference
    repo does NOT include the projector's training script — if no weights
    exist we fall back to a fixed random projection (documented divergence)."""
    if path and os.path.exists(path):
        if path.endswith(".npz"):
            with np.load(path) as z:
                return MLPProjector(jnp.asarray(z["weight"]),
                                    jnp.asarray(z["bias"]))
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        w = sd["projection.0.weight"].detach().numpy()   # (latent, 768)
        b = sd["projection.0.bias"].detach().numpy()
        return MLPProjector(jnp.asarray(w.T), jnp.asarray(b))
    print(f"[WARN] no MLP projector weights at {path!r}; using a seeded "
          "random projection")
    rng = np.random.RandomState(0)
    w = (rng.randn(768, latent_dim) / np.sqrt(768)).astype(np.float32)
    return MLPProjector(jnp.asarray(w), jnp.zeros((latent_dim,), jnp.float32))
