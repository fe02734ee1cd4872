"""CLIP byte-level BPE tokenizer.

Re-implementation of the tokenizer the reference ships for CLIP-ReID
(boxmot/reid/backbones/clip/clip/simple_tokenizer.py) so that
OpenAI-pretrained CLIP text towers can be driven with the exact token
ids they were trained on — which is what makes converting the
pretrained text transformer (models/convert.py convert_clip) useful for
CLIP-ReID stage-1 prompt learning (make_model_clipreid.py:232-278).

The merges table (`boxmot_tpu/assets/clip_bpe_vocab_16e6.txt.gz`) is
OpenAI's public CLIP BPE vocabulary — a trained data artifact that must
be byte-identical for token parity; it is vendored as data, not code.

Algorithmic notes (byte-level BPE):
  * every UTF-8 byte maps to a printable unicode codepoint (the
    canonical GPT-2 byte<->unicode table) so merges operate on strings;
  * word-final symbols carry a ``</w>`` marker;
  * merges apply best-rank-first until no mergeable pair remains.
"""

from __future__ import annotations

import functools
import gzip
import html
from pathlib import Path

import numpy as np

VOCAB_PATH = Path(__file__).resolve().parents[1] / "assets" / "clip_bpe_vocab_16e6.txt.gz"

SOT_TEXT = "<|startoftext|>"
EOT_TEXT = "<|endoftext|>"
CONTEXT_LENGTH = 77  # all CLIP text towers


def byte_unicode_table() -> dict[int, str]:
    """Canonical GPT-2/CLIP byte -> printable-unicode mapping.

    Printable latin-1 bytes map to themselves; the remaining 68 bytes
    (controls, space, DEL, a few latin-1 holes) map to 256+k so no
    token string ever contains whitespace or control characters.
    """
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    # insertion order matters: the vocab lists printable symbols first,
    # then the 256+k stand-ins — token ids depend on this ordering.
    table = {b: chr(b) for b in keep}
    bump = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + bump)
            bump += 1
    return table


def _clean(text: str) -> str:
    """Text normalization matching the reference's basic/whitespace clean.

    The reference routes text through ftfy.fix_text (mojibake repair);
    ftfy is not a baked-in dependency here, so when it is missing we
    fall back to the identity — exact for the ASCII prompt templates
    CLIP-ReID actually uses.
    """
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    return " ".join(text.split())


class ClipBPE:
    """Byte-level BPE encoder/decoder over the CLIP merges table."""

    def __init__(self, vocab_path: str | Path = VOCAB_PATH):
        self._b2u = byte_unicode_table()
        self._u2b = {u: b for b, u in self._b2u.items()}

        lines = gzip.open(vocab_path, "rt", encoding="utf-8").read().split("\n")
        # line 0 is a version banner; the table holds 48894 usable merges
        # (vocab 49152 = 256 bytes x2 + merges + 2 specials).
        merges = [tuple(ln.split()) for ln in lines[1 : 49152 - 256 - 2 + 1]]
        self.ranks: dict[tuple[str, str], int] = {
            m: i for i, m in enumerate(merges)
        }

        symbols = list(self._b2u.values())
        vocab = symbols + [s + "</w>" for s in symbols]
        vocab += ["".join(m) for m in merges]
        vocab += [SOT_TEXT, EOT_TEXT]
        self.encoder: dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.decoder: dict[int, str] = {i: tok for tok, i in self.encoder.items()}
        self.sot = self.encoder[SOT_TEXT]
        self.eot = self.encoder[EOT_TEXT]

        import regex

        self._split = regex.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            regex.IGNORECASE,
        )

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    @functools.lru_cache(maxsize=16384)
    def _merge_word(self, token: str) -> tuple[str, ...]:
        """Apply BPE merges to one pre-tokenized word (unicode-mapped)."""
        parts = [*token[:-1], token[-1] + "</w>"]
        while len(parts) > 1:
            pairs = [(parts[i], parts[i + 1]) for i in range(len(parts) - 1)]
            best = min(pairs, key=lambda p: self.ranks.get(p, 1 << 60))
            if best not in self.ranks:
                break
            # merge every non-overlapping occurrence, left to right
            merged: list[str] = []
            i = 0
            while i < len(parts):
                if (
                    i + 1 < len(parts)
                    and (parts[i], parts[i + 1]) == best
                ):
                    merged.append(parts[i] + parts[i + 1])
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        return tuple(parts)

    def encode(self, text: str) -> list[int]:
        """Text -> BPE token ids (no SOT/EOT)."""
        ids: list[int] = []
        for word in self._split.findall(_clean(text).lower()):
            if word in (SOT_TEXT, EOT_TEXT):
                ids.append(self.encoder[word])
                continue
            mapped = "".join(self._b2u[b] for b in word.encode("utf-8"))
            ids.extend(self.encoder[p] for p in self._merge_word(mapped))
        return ids

    def decode(self, ids) -> str:
        joined = "".join(self.decoder[int(i)] for i in ids)
        raw = bytes(self._u2b[c] for c in joined if c in self._u2b)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


@functools.lru_cache(maxsize=1)
def get_tokenizer() -> ClipBPE:
    return ClipBPE()


def tokenize(
    texts: str | list[str],
    context_length: int = CONTEXT_LENGTH,
    truncate: bool = False,
) -> np.ndarray:
    """Tokenize prompts into a fixed (N, context_length) int32 grid.

    Mirrors clip.tokenize (reference clip/clip.py:222-262): SOT + body +
    EOT, zero-padded; overlong prompts raise unless `truncate`, in which
    case the final slot is forced to EOT.
    """
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer()
    out = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        ids = [tok.sot, *tok.encode(text), tok.eot]
        if len(ids) > context_length:
            if not truncate:
                raise ValueError(
                    f"prompt {text!r} tokenizes to {len(ids)} > "
                    f"context_length {context_length}"
                )
            ids = ids[: context_length - 1] + [tok.eot]
        out[i, : len(ids)] = ids
    return out
