"""Text conditioning: BERT embeddings with an offline-safe fallback.

Parity surface: the reference imports ``BERT_MODEL_DIM``, ``tokenize`` and
``bert_embed`` from the PyTorch package ``video_diffusion_pytorch.text``
(reference unet3d.py:10, gaussian_diffusion.py:7), which wraps HuggingFace
``bert-base-cased``: ``tokenize`` returns padded token-id tensors and
``bert_embed`` returns either masked-mean-pooled hidden states or the CLS
vector, dimension 768.

This module provides the same three symbols:

* When a HuggingFace BERT is available locally (cached weights; this
  environment has no network egress), it is used via ``transformers`` and the
  embedding runs through torch on host CPU once per batch of captions —
  conditioning vectors are tiny and amortized over the whole sampling loop.
* Otherwise a deterministic hashed bag-of-words encoder stands in so that the
  conditioned code path is exercisable offline (clearly logged; embeddings
  are *not* semantically meaningful).
"""

from __future__ import annotations

import hashlib
import logging
from typing import List, Sequence

import numpy as np

logger = logging.getLogger(__name__)

BERT_MODEL_DIM = 768
_MAX_LENGTH = 256
_PAD_ID = 0

_hf = None  # lazily-initialized (tokenizer, model) pair or False if unavailable


def _try_load_hf():
    global _hf
    if _hf is not None:
        return _hf
    try:
        import torch  # noqa: F401
        from transformers import BertModel, BertTokenizerFast

        tok = BertTokenizerFast.from_pretrained("bert-base-cased", local_files_only=True)
        model = BertModel.from_pretrained("bert-base-cased", local_files_only=True)
        model.eval()
        _hf = (tok, model)
        logger.info("text conditioning: using local HuggingFace bert-base-cased")
    except Exception as e:  # no cached weights / no transformers
        logger.warning(
            "text conditioning: bert-base-cased unavailable (%s); "
            "falling back to deterministic hashed embeddings",
            e,
        )
        _hf = False
    return _hf


def _hash_token_id(token: str) -> int:
    digest = hashlib.sha256(token.encode("utf-8")).digest()
    return 1 + int.from_bytes(digest[:4], "little") % 30000


def tokenize(texts: str | Sequence[str]) -> np.ndarray:
    """Convert caption(s) to a padded ``(b, seq)`` int array of token ids."""
    if isinstance(texts, str):
        texts = [texts]
    hf = _try_load_hf()
    if hf:
        tok, _ = hf
        enc = tok(list(texts), padding="longest", truncation=True, max_length=_MAX_LENGTH)
        return np.asarray(enc["input_ids"], dtype=np.int64)
    rows: List[List[int]] = [
        [_hash_token_id(w) for w in t.lower().split()][:_MAX_LENGTH] for t in texts
    ]
    width = max((len(r) for r in rows), default=1) or 1
    out = np.full((len(rows), width), _PAD_ID, dtype=np.int64)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def bert_embed(token_ids: np.ndarray, return_cls_repr: bool = False) -> np.ndarray:
    """Embed token ids to ``(b, BERT_MODEL_DIM)`` float32 conditioning vectors.

    Mean-pools the final hidden states over non-pad tokens (or returns the
    CLS vector when ``return_cls_repr``), matching the reference dependency's
    contract.
    """
    token_ids = np.asarray(token_ids)
    hf = _try_load_hf()
    if hf:
        import torch

        _, model = hf
        ids = torch.as_tensor(token_ids)
        mask = ids != _PAD_ID
        with torch.no_grad():
            hidden = model(input_ids=ids, attention_mask=mask.float()).last_hidden_state
        if return_cls_repr:
            return hidden[:, 0].numpy().astype(np.float32)
        m = mask[:, :, None].float()
        pooled = (hidden * m).sum(dim=1) / m.sum(dim=1).clamp(min=1.0)
        return pooled.numpy().astype(np.float32)

    # Deterministic per-token Gaussian vectors seeded from the token id,
    # mean-pooled: stable across runs/processes, offline-safe.
    b, seq = token_ids.shape
    out = np.zeros((b, BERT_MODEL_DIM), dtype=np.float32)
    for i in range(b):
        vecs = [
            np.random.default_rng(int(t)).standard_normal(BERT_MODEL_DIM)
            for t in token_ids[i]
            if t != _PAD_ID
        ]
        if return_cls_repr and vecs:
            out[i] = vecs[0]
        elif vecs:
            out[i] = np.mean(vecs, axis=0)
    return out
