"""VLP eval pipelines: caption retrieval (ir@k/tr@k) and captioning metrics.

Capability parity with the reference's vlp_val / vlp_captioning_val eval path
(trainer eval → GeneralizedXdecoder.evaluate_retrieval
xdecoder_model.py:507-550 / evaluate_captioning :552-577 →
RetrievalEvaluator / CaptioningEvaluator).  Rows come from the karpathy arrow
datasets (data/vlp_datasets.py).

TPU-first: fixed square image buckets, one compiled embed/decode program per
bucket; caption text embedding batched through the text encoder.
"""
from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cullavo_tpu.data.evaluation.evaluators import (CaptioningEvaluator,
                                                    RetrievalEvaluator)
from cullavo_tpu.models.xdecoder.model import XDecoderModelConfig
from cullavo_tpu.pipelines.base import register_pipeline


def _prep_image(img: np.ndarray, size: int) -> np.ndarray:
    """uint8 HWC → normalized, square-resized [size, size, 3] (the retrieval
    eval resizes to a fixed square; one compiled program for the whole set)."""
    from cullavo_tpu.data.coco_panoptic import resize_image
    from cullavo_tpu.data.mappers.eval_mappers import normalize_np

    return normalize_np(resize_image(img, size))


@register_pipeline("VLPRetrievalPipeline")
class VLPRetrievalPipeline:
    """Image↔caption retrieval over karpathy-test (evaluate_retrieval)."""

    def __init__(self, cfg, model_cfg: XDecoderModelConfig, params,
                 tokenize: Callable, image_loader: Callable,
                 image_size: int = 224, batch_size: int = 8):
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.params = params
        self.tokenize = tokenize
        self.image_loader = image_loader
        self.image_size = image_size
        self.batch_size = batch_size
        cfgm = model_cfg
        from cullavo_tpu.models.xdecoder.model import evaluate_retrieval_embedding
        from cullavo_tpu.models.xdecoder.text_encoder import forward_language

        self._embed = jax.jit(lambda p, im: evaluate_retrieval_embedding(p, cfgm, im))
        # jitted text embed: eager forward_language dispatches a 12-layer
        # transformer op-by-op per chunk (~5-15 ms RPC per op on the axon
        # tunnel); text counts vary per chunk (5-7 captions/image), so pad
        # to a bucket and slice
        self._embed_text = jax.jit(lambda p, ids, mask: forward_language(
            p, cfgm.text, ids, mask))

    def evaluate_model(self, dataset: Iterable[dict],
                       limit: Optional[int] = None) -> dict:
        rows = list(dataset)
        if limit:
            rows = rows[:limit]
        ev = RetrievalEvaluator()
        B = self.batch_size
        for i in range(0, len(rows), B):
            chunk = rows[i:i + B]
            imgs = np.stack([_prep_image(self.image_loader(r), self.image_size)
                             for r in chunk])
            img_emb, img_emb2 = self._embed(self.params, jnp.asarray(imgs))
            img_emb = np.asarray(img_emb)
            img_emb2 = np.asarray(img_emb2) if img_emb2 is not None else None
            # karpathy protocol (xdecoder_model.py:507-550): EVERY caption of
            # an image joins the text pool (some karpathy-test images carry
            # 6-7), grouped by image_id — recall@k is computed over image_id
            # matches, not 1:1 row pairing
            texts, owner = [], []
            for b, r in enumerate(chunk):
                caps = list(r.get("captions") or [""])
                texts.extend(caps)
                owner.extend([b] * len(caps))
            ids, mask = self.tokenize(texts)
            ids, mask = np.asarray(ids), np.asarray(mask)
            # pad the text count to a bucket so the jitted embed compiles a
            # handful of programs instead of one per unique count
            n = ids.shape[0]
            bucket = -(-n // (5 * B)) * (5 * B)
            ids = np.pad(ids, ((0, bucket - n), (0, 0)))
            mask = np.pad(mask, ((0, bucket - n), (0, 0)))
            mask[n:, 0] = 1                 # nonempty rows keep EOT argmax sane
            t_emb = np.asarray(self._embed_text(
                self.params["text"], jnp.asarray(ids), jnp.asarray(mask)))[:n]
            for b, r in enumerate(chunk):
                sel = [j for j, o in enumerate(owner) if o == b]
                ev.add(img_emb[b], t_emb[sel],
                       image_id=r.get("image_id", i + b),
                       image_emb2=(img_emb2[b] if img_emb2 is not None
                                   else None))
        return ev.results()


@register_pipeline("COCOCaptionXDecPipeline")
class VLPCaptioningPipeline:
    """Captioning eval via the decoder's autoregressive caption head
    (evaluate_captioning; metrics from the native 4-metric evaluator)."""

    def __init__(self, cfg, model_cfg: XDecoderModelConfig, params,
                 image_loader: Callable, decode_text: Callable,
                 start_token_id: int = 49406, image_size: int = 224,
                 batch_size: int = 8):
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.params = params
        self.image_loader = image_loader
        self.decode_text = decode_text
        self.image_size = image_size
        self.batch_size = batch_size
        self.start_token_id = start_token_id

        from cullavo_tpu.models.xdecoder.decoder import forward_captioning
        from cullavo_tpu.models.xdecoder.model import backbone_and_pixel_decoder

        cfgm = model_cfg

        def run(params, images, captioning_mask=None):
            mask_features, pyramid = backbone_and_pixel_decoder(params, cfgm, images)
            tp = params["text"]
            # raw, unprojected token-embedding table — the reference scores with
            # an unnormalized dot against token_embedding.weight
            # (xdecoder.py:351-353; its invariant is text width == dim_proj).
            # Configs that break that invariant fall back to the projected table.
            vocab = tp["token_embedding"]
            if vocab.shape[-1] != cfgm.decoder.dim_proj:
                vocab = vocab @ tp["lang_proj"]

            def token_embedding_fn(ids):
                # contextual per-step re-encode, like the reference's
                # forward_language_token call each decode step (xdecoder.py:356)
                from cullavo_tpu.models.xdecoder.text_encoder import (
                    forward_language_token)
                mask = jnp.ones(ids.shape, jnp.int32)
                token_emb, _ = forward_language_token(tp, cfgm.text, ids, mask)
                return token_emb

            return forward_captioning(params["decoder"], cfgm.decoder, pyramid,
                                      mask_features, token_embedding_fn, vocab,
                                      self.start_token_id,
                                      captioning_mask=captioning_mask)

        self._decode = jax.jit(run)
        # referring captioning (rows carrying a 'captioning_mask' [H, W]
        # bool excluded-region map, xdecoder_model.py:565-567): separate jit
        # so mask-less batches keep the mask-free program
        self._decode_masked = jax.jit(run)

    def evaluate_model(self, dataset: Iterable[dict],
                       limit: Optional[int] = None,
                       out_path: Optional[str] = None) -> dict:
        rows = list(dataset)
        if limit:
            rows = rows[:limit]
        ev = CaptioningEvaluator()
        B = self.batch_size
        for i in range(0, len(rows), B):
            chunk = rows[i:i + B]
            imgs = np.stack([_prep_image(self.image_loader(r), self.image_size)
                             for r in chunk])
            if any("captioning_mask" in r for r in chunk):
                # referring captioning: excluded-region map per row (rows
                # without one get an all-False mask — a no-op)
                S = self.image_size
                cm = np.zeros((len(chunk), S, S), bool)
                for b, r in enumerate(chunk):
                    if "captioning_mask" in r:
                        m = np.asarray(r["captioning_mask"], bool)
                        ri = np.linspace(0, m.shape[0] - 1, S).astype(int)
                        ci = np.linspace(0, m.shape[1] - 1, S).astype(int)
                        cm[b] = m[ri][:, ci]
                ids = np.asarray(self._decode_masked(
                    self.params, jnp.asarray(imgs), jnp.asarray(cm)))
            else:
                ids = np.asarray(self._decode(self.params, jnp.asarray(imgs)))
            for b, r in enumerate(chunk):
                ev.add(r["image_id"], self.decode_text(ids[b].tolist()),
                       r["captions"])
        if out_path:
            ev.dump_results(out_path)
        return ev.results()
