"""VLP (vision-language pretraining) arrow datasets — karpathy splits.

Capability parity with datasets/registration/register_vlp_datasets.py:13-104:
``vlp_val`` / ``vlp_captioning_val`` (+ the *_val2017 variants) load karpathy
caption arrow files (pyarrow IPC; columns ``image`` bytes, ``caption``
list<str>, ``image_id``); val rows keep all captions per image, train rows
explode one caption per row.  Image bytes decode lazily from the memory-mapped
arrow (vlp_dataset_mapper.py:93-130 semantics) — no copies of the image pool.
"""
from __future__ import annotations

import io
import os
from typing import Optional, Sequence

import numpy as np

from cullavo_tpu.data.registry import register_dataset

EVALUATOR_MAPPER = {
    "vlp_val": "retrieval", "vlp_train": "retrieval",
    "vlp_captioning_val": "captioning",
    "vlp_val2017": "retrieval", "vlp_captioning_val2017": "captioning",
    # instruction/instp families share the vlp arrow row format and
    # evaluator mapping (register_instruction_datasets.py:30,
    # register_instp_datasets.py:30)
    "instruction_train": "retrieval", "instruction_val": "retrieval",
    "instruction_captioning_val": "captioning",
    "instruction_val2017": "retrieval",
    "instruction_captioning_val2017": "captioning",
    "instp_train": "retrieval", "instp_val": "retrieval",
    "instp_captioning_val": "captioning",
    "instp_val2017": "retrieval", "instp_captioning_val2017": "captioning",
}

PREDEFINED_SPLITS = {
    "vlp_val": ["coco_caption_karpathy_test.arrow"],
    "vlp_captioning_val": ["coco_caption_karpathy_test.arrow"],
    "vlp_val2017": ["coco_caption_karpathy_val2017.arrow"],
    "vlp_captioning_val2017": ["coco_caption_karpathy_val2017.arrow"],
    # LLaVA-style instruction tuning arrows (register_instruction_datasets.py:13-22)
    "instruction_train": ["instruction_coco2017.arrow", "instruction_gqa.arrow",
                          "instruction_ocr_vqa.arrow", "instruction_textvqa.arrow",
                          "instruction_vg.arrow"],
    "instruction_val": ["coco_caption_karpathy_test.arrow"],
    "instruction_captioning_val": ["coco_caption_karpathy_test.arrow"],
    "instruction_val2017": ["coco_caption_karpathy_val2017.arrow"],
    "instruction_captioning_val2017": ["coco_caption_karpathy_val2017.arrow"],
    # instruction-pretrain 558k arrows (register_instp_datasets.py:13-21)
    "instp_train": ["instruction_pretrain_558k.arrow"],
    "instp_val": ["coco_caption_karpathy_test.arrow"],
    "instp_captioning_val": ["coco_caption_karpathy_test.arrow"],
    "instp_val2017": ["coco_caption_karpathy_val2017.arrow"],
    "instp_captioning_val2017": ["coco_caption_karpathy_val2017.arrow"],
}


def load_vlp_arrows(root: str, arrow_paths: Sequence[str]):
    import pyarrow as pa

    tables = []
    for p in arrow_paths:
        tables.append(pa.ipc.RecordBatchFileReader(
            pa.memory_map(os.path.join(root, p), "r")).read_all())
    return tables


def load_vlp_records(tables, name: str) -> list:
    """register_vlp_datasets.py:57-104 row format: val keeps caption lists,
    train explodes one caption per row.

    instruction/instp family differences (register_instruction_datasets.py:
    55-76): path-style image ids parse on ``/`` + ``.``, and train rows keep
    the caption field whole (``[captions]``) instead of exploding."""
    instruction_family = name.startswith(("instruction_", "instp_"))
    ret = []
    for arr_id, arr in enumerate(tables):
        for i in range(len(arr)):
            captions = arr["caption"][i].as_py()
            image_id = arr["image_id"][i].as_py()
            if not isinstance(image_id, int):
                image_id = (int(str(image_id).split("/")[-1].split(".")[0])
                            if instruction_family
                            else int(str(image_id).split("_")[-1].split(".")[0]))
            if "val" in name:
                ret.append({"image_id": image_id, "captions": captions,
                            "arr_id": arr_id, "cur_id": i})
            elif instruction_family:
                ret.append({"image_id": image_id, "captions": [captions],
                            "arr_id": arr_id, "cur_id": i})
            else:
                for caption in captions:
                    ret.append({"image_id": image_id, "captions": [caption],
                                "arr_id": arr_id, "cur_id": i})
    return ret


class ArrowImageLoader:
    """Lazy image decode from the arrow tables (vlp_dataset_mapper.py:130)."""

    def __init__(self, tables):
        self.tables = tables

    def __call__(self, record: dict) -> np.ndarray:
        from PIL import Image

        arr = self.tables[record["arr_id"]]
        data = arr["image"][record["cur_id"]].as_py()
        with Image.open(io.BytesIO(data)) as im:
            return np.asarray(im.convert("RGB"))


def _family_subdir(name: str) -> str:
    """Per-family arrow subdir convention: 'llava_dataset' for the
    instruction/instp families, 'pretrain_arrows_code224' for vlp
    (register_instruction_datasets.py:90, register_vlp_datasets.py:98).
    Applied only when the subdir exists so tests can point root at flat
    fixture dirs."""
    return ("llava_dataset" if name.startswith(("instruction_", "instp_"))
            else "pretrain_arrows_code224")


def register_vlp(name: str, root: str,
                 arrow_paths: Optional[Sequence[str]] = None,
                 gt_json: Optional[str] = None):
    paths = list(arrow_paths or PREDEFINED_SPLITS.get(name, []))
    if not paths:
        raise ValueError(f"no arrow paths for {name!r}")
    sub = os.path.join(root, _family_subdir(name))
    if os.path.isdir(sub):
        root = sub

    state = {}

    def load():
        tables = load_vlp_arrows(root, paths)
        state["loader"] = ArrowImageLoader(tables)
        return load_vlp_records(tables, name)

    register_dataset(name, load, {
        "evaluator_type": EVALUATOR_MAPPER.get(name, "retrieval"),
        "gt_json": gt_json,
        "image_loader": state,      # populated at first load
    })


def register_all_vlp(root: str):
    for name in PREDEFINED_SPLITS:
        register_vlp(name, root)
