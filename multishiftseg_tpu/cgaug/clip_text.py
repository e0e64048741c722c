"""CLIP ViT-L/14 text encoder (the SD conditioning stage) in flax, plus a
self-contained CLIP BPE tokenizer.

The reference conditions generation through ``FrozenCLIPEmbedder``
(``CGAug/ControlNet/ldm/modules/encoders/modules.py:88-140``): huggingface
``CLIPTextModel`` (openai/clip-vit-large-patch14), tokenized to a fixed length
of 77, ``layer="last"`` hidden states as the cross-attention context. This
module reimplements that transformer (causal pre-LN blocks, quick-GELU MLPs,
learned position embeddings, final layer norm) as a pure flax function so the
``cond_stage_model.transformer.*`` weights inside ``control_sd15_seg.pth``
convert directly (see ``convert/sd_controlnet.py``).

The tokenizer is the standard CLIP byte-level BPE (lowercase + whitespace
cleanup, ``</w>`` word suffix, vocab.json/merges.txt files); it matches
huggingface ``CLIPTokenizer`` output (parity-tested on synthetic vocab files —
the real vocab ships with the checkpoint assets, registered in
``cgaug/weights.py``).
"""

from __future__ import annotations

import dataclasses
import gzip
import html
import json
import os
import re
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    max_len: int = 77
    mlp_ratio: int = 4
    act: str = "quick_gelu"  # ViT-L/14 text tower
    dtype: jnp.dtype = jnp.float32


def tiny_clip_config(**over) -> CLIPTextConfig:
    kw = dict(vocab_size=97, width=32, layers=2, heads=4)
    kw.update(over)
    return CLIPTextConfig(**kw)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPTextBlock(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        d = cfg.width // cfg.heads
        q = nn.Dense(cfg.width, name="q")(h).reshape(*h.shape[:2], cfg.heads, d)
        k = nn.Dense(cfg.width, name="k")(h).reshape(*h.shape[:2], cfg.heads, d)
        v = nn.Dense(cfg.width, name="v")(h).reshape(*h.shape[:2], cfg.heads, d)
        sim = jnp.einsum("bnhd,bmhd->bhnm", q.astype(jnp.float32),
                         k.astype(jnp.float32)) * (d ** -0.5)
        sim = jnp.where(mask, sim, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(*h.shape[:2], cfg.width)
        x = x + nn.Dense(cfg.width, name="proj")(o)
        h = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        h = nn.Dense(cfg.width * cfg.mlp_ratio, name="fc1")(h)
        h = _act(cfg.act)(h)
        x = x + nn.Dense(cfg.width, name="fc2")(h)
        return x


class CLIPTextEncoder(nn.Module):
    """token ids [B, 77] -> last hidden states [B, 77, width] (post final LN),
    i.e. FrozenCLIPEmbedder's ``layer="last"`` output."""

    cfg: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, tokens):
        cfg = self.cfg
        tok = nn.Embed(cfg.vocab_size, cfg.width, name="token_embedding")(tokens)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.max_len, cfg.width))
        x = (tok + pos[None, : tokens.shape[1]]).astype(cfg.dtype)
        n = tokens.shape[1]
        causal = jnp.tril(jnp.ones((n, n), bool))[None, None]
        for i in range(cfg.layers):
            x = CLIPTextBlock(cfg, name=f"layer_{i}")(x, causal)
        return nn.LayerNorm(epsilon=1e-5, name="final_ln")(x.astype(jnp.float32)).astype(cfg.dtype)


# ---------------------------------------------------------------------------
# CLIP BPE tokenizer (byte-level vocabulary with </w> word-final markers).
# ---------------------------------------------------------------------------

@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """The GPT-2/CLIP reversible byte <-> printable-unicode table."""
    bs = (list(range(ord("!"), ord("~") + 1)) + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


# the CLIP word pattern (\p{L}+ / \p{N} / other-non-space runs) in std-`re`
# terms: letters = word chars minus digits/underscore; "other" includes `_`
_PAT = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[^\W\d_]+|\d|(?:[^\s\w]|_)+",
    re.IGNORECASE,
)


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class CLIPTokenizer:
    """Minimal CLIP BPE, file-compatible with openai/clip vocab assets.

    vocab: token -> id (merged tokens use the printable-byte alphabet, word-
    final pieces end in ``</w>``); merges: ranked merge pairs. Padding follows
    huggingface CLIPTokenizer: fixed length, pad id = eot.
    """

    def __init__(self, vocab_path: str, merges_path: str, max_len: int = 77):
        opener = gzip.open if vocab_path.endswith(".gz") else open
        with opener(vocab_path, "rt", encoding="utf-8") as f:
            self.encoder: Dict[str, int] = json.load(f)
        with open(merges_path, encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [tuple(l.split()) for l in lines
                  if l and not l.startswith("#version") and len(l.split()) == 2]
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.max_len = max_len
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self._cache: Dict[str, List[str]] = {}

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word: Tuple[str, ...] = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            merged, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and (word[i], word[i + 1]) == best:
                    merged.append(word[i] + word[i + 1])
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        out = list(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = _whitespace_clean(html.unescape(html.unescape(text))).lower()
        ids: List[int] = []
        for tok in _PAT.findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[p] for p in self._bpe(tok) if p in self.encoder)
        return ids

    def __call__(self, texts) -> np.ndarray:
        """Batch-encode to fixed [B, max_len] int32 (sot ... eot, eot-padded)."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), self.max_len), self.eot, np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot] + self.encode(t)[: self.max_len - 2] + [self.eot]
            out[i, : len(ids)] = ids
        return out


def load_tokenizer(asset_dir: str, max_len: int = 77) -> CLIPTokenizer:
    """Load from a directory holding vocab.json[.gz] + merges.txt (the layout
    of huggingface openai/clip-vit-large-patch14 tokenizer assets)."""
    vocab = os.path.join(asset_dir, "vocab.json")
    if not os.path.exists(vocab):
        vocab += ".gz"
    return CLIPTokenizer(vocab, os.path.join(asset_dir, "merges.txt"), max_len)
