"""Offline feature pipeline: molecule/protein/text embeddings -> .mat.

Equivalent of the reference's run-once ``embedding.py`` (embedding.py:
22-386): drugs are embedded with ChemBERTa (SMILES, mean-pooled 768-d)
and optionally ESM-2 (protein sequences, layer-33 mean-pooled 1280-d),
the two spaces are padded to a common width and jointly PCA-reduced to
768 dims (zero-padded if fewer samples than components); diseases are
embedded with BioBERT from OMIM title text; drug names map to DrugBank
IDs by fuzzy matching (difflib ratio >= 0.8).  Results are written back
into the dataset ``.mat`` as ``drug_embed`` / ``disease_embed``.

Heavy model inference is host-side and runs once; transformer loading
is lazy and gated so the numeric plumbing (combination, PCA, fuzzy
matching) is testable without model weights or network access.
"""

from __future__ import annotations

import difflib
from typing import Dict, List, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# Transformer embedders (lazy; require local model weights)
# ---------------------------------------------------------------------------

class TextEmbedder:
    """Mean-pooled last-hidden-state embeddings from a HF checkpoint
    (reference get_text_embedding, embedding.py:202-216)."""

    def __init__(self, model_name: str, max_length: int = 512,
                 device: str = "cpu"):
        from transformers import AutoModel, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModel.from_pretrained(model_name).to(device).eval()
        self.max_length = max_length
        self.device = device

    def __call__(self, texts: Sequence[str], batch_size: int = 16) -> np.ndarray:
        import torch

        out = []
        with torch.no_grad():
            for i in range(0, len(texts), batch_size):
                batch = list(texts[i:i + batch_size])
                toks = self.tokenizer(batch, padding=True, truncation=True,
                                      max_length=self.max_length,
                                      return_tensors="pt").to(self.device)
                hidden = self.model(**toks).last_hidden_state
                mask = toks["attention_mask"][..., None].float()
                pooled = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1)
                out.append(pooled.cpu().numpy())
        return np.concatenate(out, axis=0)


def chemberta_embeddings(smiles: Sequence[str],
                         model_name: str =
                         "seyonec/PubChem10M_SMILES_BPE_450k",
                         device: str = "cpu") -> np.ndarray:
    """SMILES embeddings via ChemBERTa (embedding.py:26-35 uses the
    PubChem10M BPE-450k checkpoint, 1024-d per README)."""
    return TextEmbedder(model_name, max_length=256, device=device)(smiles)


def biobert_embeddings(texts: Sequence[str],
                       model_name: str = "dmis-lab/biobert-base-cased-v1.1",
                       device: str = "cpu") -> np.ndarray:
    """768-d disease-text embeddings (embedding.py:291-320)."""
    return TextEmbedder(model_name, device=device)(texts)


def esm2_embeddings(sequences: Sequence[str], device: str = "cpu") -> np.ndarray:
    """ESM-2 650M layer-33 mean-pooled 1280-d protein embeddings
    (embedding.py:74-105).  Requires the fair-esm package."""
    import torch

    try:
        import esm  # type: ignore
    except ImportError as e:  # pragma: no cover - optional dependency
        raise RuntimeError("fair-esm not installed; protein embeddings "
                           "unavailable") from e
    model, alphabet = esm.pretrained.esm2_t33_650M_UR50D()
    model = model.to(device).eval()
    converter = alphabet.get_batch_converter()
    out = []
    with torch.no_grad():
        for i in range(0, len(sequences), 4):
            batch = [(str(j), s[:1022]) for j, s in
                     enumerate(sequences[i:i + 4])]
            _, _, toks = converter(batch)
            reps = model(toks.to(device), repr_layers=[33])[
                "representations"][33]
            for j, (_, seq) in enumerate(batch):
                out.append(reps[j, 1:len(seq) + 1].mean(0).cpu().numpy())
    return np.stack(out)


# ---------------------------------------------------------------------------
# Pure-numpy combination / reduction / matching (always available)
# ---------------------------------------------------------------------------

def combine_embeddings(parts: Sequence[np.ndarray],
                       target_dim: int = 768) -> np.ndarray:
    """Pad embedding spaces to a common width, stack, joint-PCA to
    ``target_dim`` (embedding.py:107-198).

    With fewer samples than components, PCA yields rank < target_dim;
    missing columns are zero-padded (matching the reference fallback).
    """
    parts = [np.asarray(p, np.float64) for p in parts]
    width = max(p.shape[1] for p in parts)
    padded = [np.pad(p, ((0, 0), (0, width - p.shape[1]))) for p in parts]
    stacked = np.concatenate(padded, axis=0)

    if width <= target_dim and len(parts) == 1:
        out = np.pad(stacked, ((0, 0), (0, target_dim - width)))
        return out.astype(np.float32)

    from sklearn.decomposition import PCA

    n_comp = min(target_dim, stacked.shape[0], stacked.shape[1])
    reduced = PCA(n_components=n_comp).fit_transform(stacked)
    if n_comp < target_dim:
        reduced = np.pad(reduced, ((0, 0), (0, target_dim - n_comp)))
    return reduced.astype(np.float32)


def fuzzy_name_map(names: Sequence[str], candidates: Dict[str, str],
                   cutoff: float = 0.8) -> Dict[str, Optional[str]]:
    """Fuzzy drug-name -> DrugBank-ID mapping (embedding.py:341-358):
    difflib best match with ratio >= cutoff."""
    keys: List[str] = list(candidates)
    lowered = [k.lower() for k in keys]
    out: Dict[str, Optional[str]] = {}
    for name in names:
        match = difflib.get_close_matches(name.lower(), lowered, n=1,
                                          cutoff=cutoff)
        out[name] = candidates[keys[lowered.index(match[0])]] if match \
            else None
    return out


def build_dataset_embeddings(mat_path: str, *, smiles: Sequence[str],
                             disease_texts: Sequence[str],
                             protein_sequences: Optional[Sequence[str]] = None,
                             device: str = "cpu") -> None:
    """End-to-end pipeline: embed, combine, write back into the .mat
    (reference main(), embedding.py:256-376)."""
    from dream_gnn_tpu.data.matio import load_mat, save_mat

    raw = load_mat(mat_path)
    parts = [chemberta_embeddings(smiles, device=device)]
    if protein_sequences is not None:
        parts.append(esm2_embeddings(protein_sequences, device=device))
    drug_embed = combine_embeddings(parts, target_dim=768)
    dis_embed = biobert_embeddings(disease_texts, device=device)

    raw.drug_embed = drug_embed[: raw.n_drug]
    raw.dis_embed = dis_embed[: raw.n_dis].astype(np.float32)
    save_mat(mat_path, raw)
