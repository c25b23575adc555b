"""Data layer tests: registry, rgb2id, panoptic mapping, target padding."""
import numpy as np
import pytest

from cullavo_tpu.data import registry
from cullavo_tpu.data.coco_panoptic import (PanopticMapper, id2rgb,
                                            pad_targets, rgb2id)


def setup_function(_):
    registry.clear()


def test_registry_roundtrip():
    registry.register_dataset("toy_train", lambda: [{"a": 1}], {"classes": ["x"]})
    assert registry.get_dataset("toy_train") == [{"a": 1}]
    assert registry.get_metadata("toy_train")["classes"] == ["x"]
    assert "toy_train" in registry.list_datasets()
    with pytest.raises(KeyError):
        registry.register_dataset("toy_train", lambda: [])
    with pytest.raises(KeyError):
        registry.get_dataset("missing")


def test_rgb2id_roundtrip():
    ids = np.array([[0, 1], [256, 70000]], np.int64)
    np.testing.assert_array_equal(rgb2id(id2rgb(ids)), ids)


def _toy_record():
    H = W = 32
    pan_ids = np.zeros((H, W), np.int64)
    pan_ids[2:10, 3:12] = 7       # thing segment
    pan_ids[20:30, 5:25] = 9      # stuff segment
    pan_ids[12:14, 28:31] = 11    # crowd (filtered)
    img = np.random.default_rng(0).integers(0, 255, (H, W, 3), dtype=np.uint8)
    return {
        "image": img,
        "pan_seg": id2rgb(pan_ids),
        "image_id": 42,
        "segments_info": [
            {"id": 7, "category_id": 0, "iscrowd": 0, "isthing": True},
            {"id": 9, "category_id": 5, "iscrowd": 0, "isthing": False},
            {"id": 11, "category_id": 1, "iscrowd": 1, "isthing": True},
        ],
    }


def test_panoptic_mapper():
    mapper = PanopticMapper(image_size=64)
    out = mapper(_toy_record())
    assert out["image"].shape == (64, 64, 3)
    assert out["classes"].tolist() == [0, 5]     # crowd filtered
    assert out["is_thing"].tolist() == [True, False]
    assert out["masks"].shape == (2, 64, 64)
    # box of segment 7 scaled 32→64: x in [6, 24), y in [4, 20)
    b = out["boxes"][0]
    assert 5 <= b[0] <= 7 and 3 <= b[1] <= 5 and 23 <= b[2] <= 25 and 19 <= b[3] <= 21
    # mask area roughly scales (8x9 → 4x area at 2x scale)
    assert abs(out["masks"][0].sum() - 4 * 8 * 9) / (4 * 8 * 9) < 0.3


def test_pad_targets():
    mapper = PanopticMapper(image_size=64)
    m = mapper(_toy_record())
    batch = pad_targets([m, None], max_instances=4, mask_size=32)
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["classes"].shape == (2, 4)
    assert batch["valid"][0].tolist() == [True, True, False, False]
    assert not batch["valid"][1].any()
    assert batch["masks"].shape == (2, 4, 32, 32)
    # boxes normalized cxcywh in [0, 1]
    assert (batch["boxes"] >= 0).all() and (batch["boxes"] <= 1).all()


def test_native_preprocess_matches_jax_path():
    from cullavo_tpu.data.image_processing import preprocess_numpy
    from cullavo_tpu import native

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (50, 70, 3), dtype=np.uint8),
            rng.integers(0, 255, (90, 40, 3), dtype=np.uint8)]
    via_jax = preprocess_numpy(imgs, size=32, use_native=False)
    assert via_jax.shape == (2, 3, 32, 32)
    if native.available():
        via_native = preprocess_numpy(imgs, size=32, use_native=True)
        assert via_native.shape == (2, 3, 32, 32)
        # both implement antialiased bicubic + CLIP normalize; kernels differ
        # slightly (jax.image vs PIL-convention weights) — require closeness
        diff = np.abs(via_native - via_jax)
        assert diff.mean() < 0.05, diff.mean()


def test_polygon_to_mask_square():
    from cullavo_tpu.data.datasets import polygons_to_mask

    # square from (2,2) to (6,6)
    mask = polygons_to_mask([[2, 2, 6, 2, 6, 6, 2, 6]], 8, 8)
    assert mask[3, 3] == 1 and mask[5, 5] == 1
    assert mask[0, 0] == 0 and mask[7, 7] == 0
    assert 12 <= mask.sum() <= 20  # ~4x4 region


def test_rle_to_mask():
    from cullavo_tpu.data.datasets import rle_to_mask

    # column-major: 3 zeros, 2 ones, rest zeros in a 3x3
    mask = rle_to_mask({"counts": [3, 2, 4], "size": [3, 3]})
    assert mask.shape == (3, 3)
    assert mask.sum() == 2
    # column-major positions 3,4 → (r0,c1),(r1,c1)
    assert mask[0, 1] == 1 and mask[1, 1] == 1


def test_dataloader_prefetch_and_order():
    from cullavo_tpu.data.loader import DataLoader, inference_indices

    records = list(range(10))
    loader = DataLoader(records, mapper=lambda r: r * 2,
                        collate=lambda xs: sum(xs), batch_size=3,
                        shuffle=False, drop_incomplete=True)
    batches = list(loader)
    assert len(batches) == 3 == len(loader)
    assert batches[0] == (0 + 2 + 4)

    # error propagation from workers
    bad = DataLoader(records, mapper=lambda r: 1 / 0,
                     collate=lambda xs: xs, batch_size=2, shuffle=False)
    import pytest as _pytest
    with _pytest.raises(ZeroDivisionError):
        list(bad)

    # inference sharding
    assert inference_indices(10, 0, 4) == [0, 1, 2]
    assert inference_indices(10, 3, 4) == [9]


def test_dataloader_infinite():
    from cullavo_tpu.data.loader import DataLoader

    loader = DataLoader(list(range(4)), mapper=lambda r: r,
                        collate=lambda xs: xs, batch_size=2, infinite=True,
                        seed=1)
    it = iter(loader)
    seen = [tuple(next(it)) for _ in range(6)]
    assert len(seen) == 6  # keeps producing past one epoch


def test_transforms_lsj_and_flip():
    from cullavo_tpu.data.transforms import (large_scale_jitter, overlay_masks,
                                             random_flip)

    rng = np.random.default_rng(0)
    record = {
        "image": rng.integers(0, 255, (40, 60, 3), dtype=np.uint8),
        "boxes": np.array([[10, 5, 30, 25]], np.float32),
        "masks": np.zeros((1, 40, 60), np.float32),
    }
    record["masks"][0, 5:25, 10:30] = 1

    flipped = random_flip(record, np.random.default_rng(1), prob=1.0)
    assert flipped["boxes"][0].tolist() == [30, 5, 50, 25]
    assert flipped["masks"][0, 10, 35] == 1  # mask moved with the flip
    # flip twice → identity
    twice = random_flip(flipped, np.random.default_rng(1), prob=1.0)
    np.testing.assert_array_equal(twice["image"], record["image"])

    out = large_scale_jitter(record, np.random.default_rng(2), out_size=64)
    assert out["image"].shape == (64, 64, 3)
    assert out["masks"].shape[1:] == (64, 64)
    assert (out["boxes"] >= 0).all() and (out["boxes"] <= 64).all()
    # mask and box stay consistent (box roughly bounds the mask)
    ys, xs = np.nonzero(out["masks"][0] > 0.5)
    if len(xs):
        b = out["boxes"][0]
        assert xs.min() >= b[0] - 2 and xs.max() <= b[2] + 2

    vis = overlay_masks(record["image"], record["masks"])
    assert vis.shape == record["image"].shape and vis.dtype == np.uint8
    assert (vis != record["image"]).any()


def test_native_nf4_quantizer_matches_numpy():
    from cullavo_tpu import native
    from cullavo_tpu.ops.nf4 import quantize_linear_planar_numpy

    if not native.available():
        import pytest as _pytest
        _pytest.skip("no compiler")
    rng = np.random.default_rng(3)
    w = rng.standard_normal((2, 64, 128), dtype=np.float32) * 0.05
    a = native.nf4_quantize_planar_native(w)
    b = quantize_linear_planar_numpy(w)
    np.testing.assert_array_equal(a["q4p"], b["q4p"])
    np.testing.assert_allclose(a["scale"], b["scale"], rtol=1e-6)


def test_loader_device_prefetch():
    import jax

    from cullavo_tpu.data.loader import DataLoader

    records = list(range(8))
    dl = DataLoader(records, mapper=lambda r: {"x": np.full((2,), r, np.float32)},
                    collate=lambda rows: {"x": np.stack([r["x"] for r in rows])},
                    batch_size=4, shuffle=False, device_prefetch=True)
    batches = list(dl)
    assert len(batches) == 2
    assert isinstance(batches[0]["x"], jax.Array)
    np.testing.assert_array_equal(np.asarray(batches[0]["x"])[:, 0], [0, 1, 2, 3])


def test_semantic_train_mapper():
    """mask_former_semantic semantics: one mask per present class, ignore
    pixels excluded, stuff (is_thing False), PanopticMapper-shaped output
    (mask_former_semantic_dataset_mapper.py:166-173)."""
    from cullavo_tpu.data.mappers import SemanticTrainMapper
    from cullavo_tpu.data.coco_panoptic import pad_targets

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
    sem = np.full((40, 60), 255, np.uint8)        # ignore everywhere...
    sem[5:20, 10:30] = 3                           # ...except two classes
    sem[25:38, 35:55] = 7
    mapper = SemanticTrainMapper(image_size=32, scale_range=(1.0, 1.0),
                                 flip_prob=0.0, seed=0)
    out = mapper({"image": img, "sem_seg": sem, "image_id": 1})
    assert set(out["classes"].tolist()) <= {3, 7}
    assert len(out["classes"]) >= 1
    assert out["masks"].shape[1:] == (32, 32)
    assert not out["is_thing"].any()
    # each mask covers exactly its class's pixels
    for cid, m in zip(out["classes"], out["masks"]):
        assert m.sum() > 0
    # composes with the SPMD target padding
    batch = pad_targets([out], max_instances=4)
    assert batch["classes"].shape == (1, 4)

    # all-ignore label map → skipped record
    assert mapper({"image": img, "sem_seg": np.full((40, 60), 255, np.uint8)}) is None


def test_instance_train_mapper_lsj():
    """coco_instance_lsj semantics: polygon → mask, crowd filter, LSJ+flip,
    fully-cropped-out instances dropped."""
    from cullavo_tpu.data.mappers import InstanceTrainMapper

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    square = [[10.0, 10.0, 30.0, 10.0, 30.0, 30.0, 10.0, 30.0]]
    record = {
        "image": img, "height": 64, "width": 64, "image_id": 5,
        "annotations": [
            {"bbox": [10, 10, 20, 20], "segmentation": square,
             "category_id": 2, "iscrowd": 0},
            {"bbox": [0, 0, 5, 5], "segmentation": square,
             "category_id": 9, "iscrowd": 1},      # crowd: filtered
        ],
    }
    mapper = InstanceTrainMapper(image_size=48, scale_range=(1.0, 1.0),
                                 flip_prob=0.0, seed=0)
    out = mapper(record)
    assert out is not None
    assert out["classes"].tolist() == [2]
    assert out["is_thing"].all()
    assert out["masks"].shape == (1, 48, 48)
    assert out["masks"][0].sum() > 0
    x0, y0, x1, y1 = out["boxes"][0]
    assert 0 <= x0 < x1 <= 48 and 0 <= y0 < y1 <= 48
