"""COCO panoptic + caption + grounding joint-training data path.

Capability parity with the reference's X-Decoder joint-training inputs:
  * registration merging panoptic annotations with per-image captions and
    grounding (referring) annotations —
    datasets/registration/register_coco_panoptic_annos_caption_grounding.py:100-170,
  * caption-noun extraction with the class-similarity threshold 0.95 —
    datasets/dataset_mappers/coco_panoptic_new_baseline_dataset_mapper.py:125-155
    + modeling/language/misc.py:50-63 (``text_noun_with_prompt_all``),
  * grounding mask/text/hash assembly —
    coco_panoptic_new_baseline_dataset_mapper.py:198-253 and
    refcoco_dataset_mapper.py:200 (the hash key),
  * noun-hash target prep feeding the caption/grounding losses —
    modeling/architectures/xdecoder_model.py:712-760.

TPU-first: everything here is host-side input-pipeline work producing
static-shape numpy batches (token ids, padded masks, hash vectors); text
EMBEDDINGS are computed inside the jitted train step so the text encoder
trains (get_text_embeddings with grad in the reference).
"""
from __future__ import annotations

import collections
import json
import os
from typing import Optional, Sequence

import numpy as np

from cullavo_tpu.data.coco_panoptic import PanopticMapper, pad_targets, rgb2id
from cullavo_tpu.data.registry import register_dataset

# hash modulus — the reference uses hash(stem(txt)) % 10**16
# (xdecoder_model.py:726); int64-safe here
_HASH_MOD = 10 ** 16


_STEMMER = None  # module-level singleton: stem() sits in the METEOR and
                 # noun-extraction hot loops (O(words²) per caption pair)


def stem(word: str) -> str:
    """Lancaster stemmer when nltk has it, suffix-strip fallback otherwise
    (same fallback as criterion.caption_noun_targets)."""
    global _STEMMER
    if _STEMMER is None:
        try:
            from nltk.stem.lancaster import LancasterStemmer

            _STEMMER = LancasterStemmer()
        except Exception:
            _STEMMER = False
    if _STEMMER:
        try:
            return _STEMMER.stem(word)
        except Exception:
            pass
    for suf in ("ing", "es", "ed", "s"):
        if word.endswith(suf) and len(word) > len(suf) + 2:
            return word[:-len(suf)]
    return word


def text_hash(text: str) -> int:
    """Stable noun/caption hash: the reference uses python ``hash`` (salted
    per-process); md5 here so fixtures and multi-host workers agree."""
    import hashlib

    h = hashlib.md5(stem(text.lower()).encode()).hexdigest()
    return int(h[:15], 16) % _HASH_MOD


# small function-word list for the POS-tagger-free noun heuristic
_STOPWORDS = frozenset(
    "a an the this that these those there here is are was were be been being "
    "am do does did have has had having will would shall should may might can "
    "could must of in on at by for with from to into onto over under above "
    "below between through during before after about against along among "
    "around behind beside near off out up down and or but nor so yet as if "
    "while because since until than then when where why how what which who "
    "whom whose it its he she his her him they them their we us our you your "
    "i me my mine not no nor very too also just only quite some any each "
    "every all both few more most other another such own same s t don now "
    "sitting standing looking walking running holding wearing riding playing "
    "eating flying jumping laying hanging parked covered filled topped".split())


def extract_nouns(text: str) -> list:
    """Caption → candidate nouns (modeling/language/misc.py:50-63).  Tries
    nltk POS tagging (NN/NNS/NNP); falls back to a stopword heuristic when
    the tagger data is absent (offline environments)."""
    try:
        import nltk

        tokens = nltk.word_tokenize(text.lower())
        tags = nltk.pos_tag(tokens)
        return [w for w, t in tags if t in ("NN", "NNS", "NNP")]
    except Exception:
        words = [w.strip(".,!?;:'\"()") for w in text.lower().split()]
        return [w for w in words
                if w and w.isalpha() and len(w) > 2 and w not in _STOPWORDS]


def extract_caption_nouns(caption: str,
                          similarity: Optional[dict] = None,
                          threshold: float = 0.95,
                          class_names: Optional[Sequence[str]] = None) -> list:
    """Nouns kept for the caption loss: similarity-to-COCO-class below the
    threshold (coco_panoptic_new_baseline_dataset_mapper.py:146-154 — nouns
    that ARE coco classes are dropped; those get the class loss instead).

    ``similarity``: {noun: score} like the reference's
    caption_class_similarity.pth table.  Without one, a stemmed exact match
    against ``class_names`` stands in for similarity 1.0.
    """
    nouns = extract_nouns(caption)
    if similarity is not None:
        return [n for n in nouns if similarity.get(n, (0.0,))[0] < threshold]
    if class_names:
        stemmed = {stem(c.split("-")[0].split(" ")[-1].lower())
                   for c in class_names}
        return [n for n in nouns if stem(n) not in stemmed]
    return nouns


def load_coco_panoptic_caption_grounding_json(
        panoptic_json: str, image_dir: str, panoptic_dir: str,
        caption_json: str, grounding_json: str, metadata: dict,
        lvis_json: Optional[str] = None) -> list:
    """Merged records (register_coco_panoptic_annos_caption_grounding.py:
    120-170): panoptic record + ``captions`` [str] + ``grounding_info``
    [COCO-instance-style anns with sentences].  With ``lvis_json``, each
    record also carries ``lvis_info`` — LVIS instance annotations for the
    image (register_coco_lvis_panoptic_annos_caption_grounding.py:126-152,
    the ``_filtall``/``_filtrefgumdval`` training splits)."""
    from cullavo_tpu.data.coco_panoptic import load_coco_panoptic_json

    records = load_coco_panoptic_json(panoptic_json, image_dir, panoptic_dir,
                                      metadata)
    with open(caption_json) as f:
        cap_info = json.load(f)
    cap_dict = collections.defaultdict(list)
    for ann in cap_info["annotations"]:
        cap_dict[int(ann["image_id"])].append(ann["caption"])
    with open(grounding_json) as f:
        grd_info = json.load(f)
    grd_dict = collections.defaultdict(list)
    for ann in grd_info["annotations"]:
        grd_dict[int(ann["image_id"])].append(ann)
    lvis_dict = None
    if lvis_json is not None:
        with open(lvis_json) as f:
            lvis_info = json.load(f)
        lvis_dict = collections.defaultdict(list)
        for ann in lvis_info["annotations"]:
            lvis_dict[int(ann["image_id"])].append(ann)
    for rec in records:
        rec["captions"] = cap_dict.get(int(rec["image_id"]), [])
        rec["grounding_info"] = grd_dict.get(int(rec["image_id"]), [])
        if lvis_dict is not None:
            rec["lvis_info"] = lvis_dict.get(int(rec["image_id"]), [])
    return records


def register_coco_panoptic_caption_grounding(
        name: str, panoptic_json: str, image_dir: str, panoptic_dir: str,
        caption_json: str, grounding_json: str,
        metadata: Optional[dict] = None, lvis_json: Optional[str] = None):
    md = dict(metadata or {})
    register_dataset(
        name,
        lambda: load_coco_panoptic_caption_grounding_json(
            panoptic_json, image_dir, panoptic_dir, caption_json,
            grounding_json, md, lvis_json=lvis_json),
        md)


class JointTrainMapper:
    """Merged record → panoptic targets + caption nouns + grounding targets.

    Extends PanopticMapper's output with:
      captions        [str]  (raw, one randomly picked at collate time)
      captions_noun   [[str]] per caption (similarity-filtered)
      grounding_masks [G, S, S] float
      grounding_texts [G str]
      grounding_hash  [G int]
    (coco_panoptic_new_baseline_dataset_mapper.py:125-253 semantics; the
    random per-epoch choices happen in ``collate_joint``.)
    """

    def __init__(self, image_size: int = 512, class_names=None,
                 similarity: Optional[dict] = None, caption_thres: float = 0.95,
                 load_image=None):
        self.panoptic = PanopticMapper(image_size=image_size,
                                       load_image=load_image)
        self.image_size = image_size
        self.class_names = class_names
        self.similarity = similarity
        self.caption_thres = caption_thres

    def __call__(self, record: dict) -> Optional[dict]:
        out = self.panoptic(record)
        if out is None:
            return None
        captions = list(record.get("captions", []))
        out["captions"] = captions
        out["captions_noun"] = [
            extract_caption_nouns(c, self.similarity, self.caption_thres,
                                  self.class_names) for c in captions]

        S = self.image_size
        g_masks, g_texts, g_hash = [], [], []
        for ann in record.get("grounding_info", []):
            seg = ann.get("segmentation")
            if seg is None or not ann.get("sentences"):
                continue
            from cullavo_tpu.data.datasets import polygons_to_mask, rle_to_mask

            if isinstance(seg, dict):
                m = rle_to_mask(seg)
            else:
                m = polygons_to_mask(seg, ann.get("height", record.get("height", S)),
                                     ann.get("width", record.get("width", S)))
            H, W = m.shape
            yy = np.clip((np.arange(S) + 0.5) * H / S, 0, H - 1).astype(np.int64)
            xx = np.clip((np.arange(S) + 0.5) * W / S, 0, W - 1).astype(np.int64)
            g_masks.append(m[yy][:, xx].astype(np.float32))
            g_texts.append([s["raw"].lower() if isinstance(s, dict) else str(s)
                            for s in ann["sentences"]])
            g_hash.append(text_hash(g_texts[-1][0]))
        out["grounding_masks"] = g_masks
        out["grounding_texts"] = g_texts
        out["grounding_hash"] = g_hash
        return out


def labels_hash_for(classes: np.ndarray, class_names: Sequence[str]) -> np.ndarray:
    """Per-instance class-name hashes (xdecoder_model.py:727): hash of the
    stemmed cleaned class name."""
    cleaned = [c.replace("-other", "").replace("-merged", "")
                .replace("-stuff", "") for c in class_names]
    table = np.asarray([text_hash(c) for c in cleaned], np.int64)
    return table[np.clip(classes, 0, len(table) - 1)]


def collate_joint(mapped: list, tokenize, class_names: Sequence[str],
                  rng: np.random.Generator, max_instances: int = 20,
                  max_positives: int = 8, max_groundings: int = 4,
                  mask_size: Optional[int] = None) -> dict:
    """Mapped rows → one static-shape joint-training batch.

    Beyond ``pad_targets`` seg targets, adds (all padded + validity-masked):
      labels_hash     [B, N]        int64
      caption_ids     [B, P, T]     noun prompts + the sampled caption (last)
      caption_mask    [B, P, T]
      caption_hash    [B, P]
      caption_valid   [B, P]
      caption_text_ids/_mask [B, T] the sampled full caption (captioning CE +
                                    retrieval ITC text side)
      grounding_ids   [B, G, T] (+ _mask), grounding_hash [B, G]
      grounding_masks [B, G, h, w], grounding_valid [B, G]

    One caption per image and one sentence per grounding annotation are
    sampled per call (rand_index semantics, xdecoder_model.py:716-717 and
    coco_panoptic_new_baseline_dataset_mapper.py:219).
    """
    from cullavo_tpu.utils.constants import prompt_engineering

    batch = pad_targets(mapped, max_instances, mask_size=mask_size)
    B = len(mapped)
    batch["labels_hash"] = np.where(
        batch["valid"],
        labels_hash_for(batch["classes"], class_names), 0).astype(np.int64)

    ms = mask_size or next(m for m in mapped if m is not None)["image"].shape[0]
    probe_ids, _ = tokenize(["probe"])
    T = np.asarray(probe_ids).shape[-1]
    P, G = max_positives, max_groundings
    cap_ids = np.zeros((B, P, T), np.int32)
    cap_mask = np.zeros((B, P, T), np.int32)
    cap_hash = np.zeros((B, P), np.int64)
    cap_valid = np.zeros((B, P), bool)
    cap_text_ids = np.zeros((B, T), np.int32)
    cap_text_mask = np.zeros((B, T), np.int32)
    g_ids = np.zeros((B, G, T), np.int32)
    g_mask = np.zeros((B, G, T), np.int32)
    g_hash = np.zeros((B, G), np.int64)
    g_valid = np.zeros((B, G), bool)
    g_masks = np.zeros((B, G, ms, ms), np.float32)

    for i, m in enumerate(mapped):
        if m is None:
            continue
        caps = m.get("captions") or []
        if caps:
            j = int(rng.integers(len(caps)))
            text = caps[j]
            nouns = (m.get("captions_noun") or [[]] * len(caps))[j]
            # noun prompt-engineering + the raw caption as the final positive
            # (xdecoder_model.py:718-726)
            texts = [prompt_engineering(n, topk=10000, suffix=".", rng=rng)
                     for n in nouns[: P - 1]] + [text]
            hashes = [text_hash(n) for n in nouns[: P - 1]] + [text_hash(text)]
            ids, msk = tokenize(texts)
            n = len(texts)
            cap_ids[i, :n] = np.asarray(ids)[:, :T]
            cap_mask[i, :n] = np.asarray(msk)[:, :T]
            cap_hash[i, :n] = hashes
            cap_valid[i, :n] = True
            tid, tmsk = tokenize([text])
            cap_text_ids[i] = np.asarray(tid).reshape(-1)[:T]
            cap_text_mask[i] = np.asarray(tmsk).reshape(-1)[:T]
        gm = m.get("grounding_masks") or []
        if gm:
            order = rng.permutation(len(gm))[:G]
            texts = [m["grounding_texts"][k][
                int(rng.integers(len(m["grounding_texts"][k])))]
                for k in order]
            ids, msk = tokenize(texts)
            n = len(order)
            g_ids[i, :n] = np.asarray(ids)[:, :T]
            g_mask[i, :n] = np.asarray(msk)[:, :T]
            # hash of the SAMPLED sentence (the one actually embedded) — the
            # mapper's sentences[0] hash would wrongly smooth/split CE
            # targets whenever annotations carry multiple sentences
            g_hash[i, :n] = [text_hash(t) for t in texts]
            g_valid[i, :n] = True
            for slot, k in enumerate(order):
                src = gm[k]
                if src.shape != (ms, ms):
                    H, W = src.shape
                    yy = np.clip((np.arange(ms) + 0.5) * H / ms, 0, H - 1).astype(np.int64)
                    xx = np.clip((np.arange(ms) + 0.5) * W / ms, 0, W - 1).astype(np.int64)
                    src = src[yy][:, xx]
                g_masks[i, slot] = src

    batch.update({
        "caption_ids": cap_ids, "caption_mask": cap_mask,
        "caption_hash": cap_hash, "caption_valid": cap_valid,
        "caption_text_ids": cap_text_ids, "caption_text_mask": cap_text_mask,
        "grounding_ids": g_ids, "grounding_token_mask": g_mask,
        "grounding_hash": g_hash, "grounding_valid": g_valid,
        "grounding_masks": g_masks,
    })
    return batch
