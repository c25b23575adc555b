"""ImageNet zero-shot classification pipeline (CLIP dual tower).

Capability parity with pipeline/LLaVAImageNetPipeline.py:80-194: class
embeddings from prompt-ensembled templates, image embedding from the CLIP
vision tower (CLS token through the projection), cosine top-1/top-5, per-class
accuracy CSV.

Uses the LLaVA vision tower + a text tower (the X-Decoder text encoder class
works for this) — classification is by CLIP similarity, exactly like the
reference (the LLaVA model there is loaded but classification is CLIP's).
"""
from __future__ import annotations

import csv
import os
from collections import defaultdict
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cullavo_tpu.pipelines.base import register_pipeline


@register_pipeline("LLaVAImageNetPipeline")
class ImageNetPipeline:
    def __init__(self, cfg, image_embed_fn, class_embeds: jax.Array,
                 class_names: list, batch_size: int = 64):
        """``image_embed_fn(pixel_values [B,3,H,W]) -> [B, D]`` normalized;
        ``class_embeds [C, D]`` normalized prompt-ensembled class embeddings."""
        self.cfg = cfg
        self.image_embed_fn = image_embed_fn
        self.class_embeds = class_embeds
        self.class_names = class_names
        self.batch_size = batch_size
        self.top1 = defaultdict(lambda: [0, 0])
        self.top5_hits = 0
        self.total = 0

    def evaluate_model(self, dataset: Iterable[dict], limit: Optional[int] = None,
                       out_dir: Optional[str] = None) -> dict:
        rows = list(dataset)
        if limit:
            rows = rows[:limit]
        for i in range(0, len(rows), self.batch_size):
            chunk = rows[i:i + self.batch_size]
            pix = jnp.asarray(np.stack([r["pixel_values"] for r in chunk]))
            emb = self.image_embed_fn(pix)                      # [B, D]
            sim = emb @ self.class_embeds.T                     # [B, C]
            k = min(5, sim.shape[-1])
            top5 = np.asarray(jax.lax.top_k(sim, k)[1])
            for r, t5 in zip(chunk, top5):
                label = int(r["label"])
                self.total += 1
                self.top1[label][1] += 1
                if t5[0] == label:
                    self.top1[label][0] += 1
                if label in t5:
                    self.top5_hits += 1
        top1_acc = 100.0 * sum(v[0] for v in self.top1.values()) / max(self.total, 1)
        top5_acc = 100.0 * self.top5_hits / max(self.total, 1)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "imagenet_per_class.csv"), "w",
                      newline="") as f:
                w = csv.writer(f)
                w.writerow(["class", "top1", "n"])
                for label, (hit, n) in sorted(self.top1.items()):
                    name = self.class_names[label] if label < len(self.class_names) else label
                    w.writerow([name, round(100.0 * hit / max(n, 1), 2), n])
                w.writerow(["TOTAL", round(top1_acc, 2), self.total])
        return {"top1": round(top1_acc, 2), "top5": round(top5_acc, 2),
                "n": self.total}
