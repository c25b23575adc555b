"""Tokenizer layer.

Production path wraps a HuggingFace tokenizer loaded from a local checkpoint
directory (LLaMA sentencepiece for CuLLaVO, CLIP BPE for X-Decoder text) —
the reference does the same via ``AutoProcessor`` (cullavo/load_cullavo.py:85-90).

Tests use ``ByteTokenizer``, a dependency-free deterministic tokenizer with
the same interface, so the prompt/label assembly logic is testable without
pretrained artifacts (zero-egress environment).
"""
from __future__ import annotations

from typing import Protocol, Sequence

import numpy as np


class Tokenizer(Protocol):
    bos_token_id: int
    eos_token_id: int
    image_token_id: int
    pad_token_id: int

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]: ...
    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str: ...


class HFTokenizer:
    """Wraps a HF tokenizer from a local path; adds the ``<image>`` token id."""

    def __init__(self, path: str, image_token: str = "<image>"):
        from transformers import AutoTokenizer

        self.tk = AutoTokenizer.from_pretrained(path)
        self.bos_token_id = self.tk.bos_token_id
        self.eos_token_id = self.tk.eos_token_id
        self.pad_token_id = self.tk.pad_token_id or self.tk.eos_token_id
        image_id = self.tk.convert_tokens_to_ids(image_token)
        if image_id is None or image_id == self.tk.unk_token_id:
            self.tk.add_tokens([image_token])
            image_id = self.tk.convert_tokens_to_ids(image_token)
        self.image_token_id = image_id

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        return self.tk.encode(text, add_special_tokens=add_special_tokens)

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return self.tk.decode(ids, skip_special_tokens=skip_special_tokens)


class ByteTokenizer:
    """Deterministic byte-level tokenizer for tests.

    ids: 0=pad, 1=bos, 2=eos, 3=<image>, byte b → b + 4.
    """

    pad_token_id = 0
    bos_token_id = 1
    eos_token_id = 2
    image_token_id = 3
    vocab_size = 260

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        ids: list[int] = [self.bos_token_id] if add_special_tokens else []
        i = 0
        data = text
        while i < len(data):
            if data.startswith("<image>", i):
                ids.append(self.image_token_id)
                i += len("<image>")
            elif data.startswith("</s>", i):
                ids.append(self.eos_token_id)
                i += len("</s>")
            else:
                ids.extend(b + 4 for b in data[i].encode("utf-8"))
                i += 1
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        out = bytearray()
        for t in np.asarray(ids).tolist():
            if t == self.image_token_id and not skip_special_tokens:
                out.extend(b"<image>")
            elif t >= 4:
                out.append(t - 4)
            elif t == self.eos_token_id and not skip_special_tokens:
                out.extend(b"</s>")
        return out.decode("utf-8", errors="replace")
