"""Data layer: trigger/target geometry (incl. parity vs the reference
factory), poison split semantics, batch schema, device compositing."""

import os
import sys
import types

import numpy as np
import pytest

from baddiffusion_tpu.data import Backdoor, DatasetLoader, poison_batch, poison_batch_host, trigger_mask


class TestTriggers:
    def test_box_14_geometry(self):
        bd = Backdoor()
        trig = bd.get_trigger(Backdoor.TRIGGER_BOX_14, channel=3, image_size=32)
        assert trig.shape == (32, 32, 3)
        # bottom-right anchored with 2px gap: rows/cols 16..29 inclusive
        assert np.all(trig[16:30, 16:30] == 0.0)  # grey of [-1,1]
        assert np.all(trig[:16, :] == -1.0)
        assert np.all(trig[:, :16] == -1.0)
        assert np.all(trig[30:, :] == -1.0)

    def test_white_box(self):
        bd = Backdoor()
        trig = bd.get_trigger(Backdoor.TRIGGER_SM_BOX, channel=1, image_size=32)
        assert np.all(trig[16:30, 16:30] == 1.0)

    def test_none_trigger(self):
        bd = Backdoor()
        trig = bd.get_trigger(Backdoor.TRIGGER_NONE, channel=3, image_size=32)
        assert np.all(trig == -1.0)

    def test_image_triggers_and_targets(self):
        bd = Backdoor()
        for tt in (Backdoor.TRIGGER_STOP_SIGN_14, Backdoor.TRIGGER_GLASSES):
            trig = bd.get_trigger(tt, channel=3, image_size=32)
            assert trig.shape == (32, 32, 3)
            assert trig.min() >= -1.0 and trig.max() <= 1.0
            assert (trig > -1.0).any()
        trig = bd.get_trigger(Backdoor.TRIGGER_BOX_14, channel=3, image_size=32)
        for tgt_type in (Backdoor.TARGET_TG, Backdoor.TARGET_SHIFT, Backdoor.TARGET_CORNER,
                         Backdoor.TARGET_HAT, Backdoor.TARGET_CAT):
            tgt = bd.get_target(tgt_type, trigger=trig)
            assert tgt.shape == (32, 32, 3)
            # bg2grey: nothing below the 30% grey threshold
            assert tgt.min() >= (1 - -1) * 0.3 + -1 - 1e-6

    def test_corner_target_geometry(self):
        bd = Backdoor()
        trig = bd.get_trigger(Backdoor.TRIGGER_BOX_14, channel=1, image_size=32)
        tgt = bd.get_target(Backdoor.TARGET_CORNER, trigger=trig)
        thres = -0.4  # grey floor
        assert np.all(tgt[:10, :10] == 0.0)
        assert np.all(tgt[10:, 10:] == pytest.approx(thres))

    def test_mask(self):
        bd = Backdoor()
        trig = bd.get_trigger(Backdoor.TRIGGER_BOX_14, channel=3, image_size=32)
        mask = trigger_mask(trig)
        assert np.all(mask[16:30, 16:30] == 0.0)
        assert np.all(mask[:16, :] == 1.0)


@pytest.mark.reference
class TestTriggerParityVsReference:
    def _reference_backdoor(self):
        import sys

        from tests.torchvision_shim import install

        install()
        sys.path.insert(0, "/root/reference")
        cwd = os.getcwd()
        os.chdir("/root/reference")  # its asset paths are cwd-relative
        from dataset import Backdoor as RefBackdoor

        return RefBackdoor(root="/tmp/ref_ds"), cwd

    @pytest.mark.parametrize(
        "trig_type",
        ["BOX_18", "BOX_14", "BOX_11", "BOX_8", "BOX_4", "BIG_BOX", "SM_BOX", "NONE", "GLASSES",
         "STOP_SIGN_14"],
    )
    def test_trigger_parity(self, trig_type):
        ref, cwd = self._reference_backdoor()
        try:
            ref_trig = ref.get_trigger(type=trig_type, channel=3, image_size=32).numpy().transpose(1, 2, 0)
        finally:
            os.chdir(cwd)
        ours = Backdoor().get_trigger(trig_type, channel=3, image_size=32)
        # image-based triggers may differ by ≤1px of resampling; boxes are exact
        tol = 0.35 if trig_type in ("GLASSES", "STOP_SIGN_14") else 1e-6
        mismatch = np.abs(ours - ref_trig) > 1e-3
        if trig_type in ("GLASSES", "STOP_SIGN_14"):
            assert mismatch.mean() < 0.1, f"{trig_type}: {mismatch.mean():.3f} pixels differ"
        else:
            np.testing.assert_allclose(ours, ref_trig, atol=tol)

    @pytest.mark.parametrize("tgt_type", ["TRIGGER", "SHIFT", "CORNER", "HAT", "CAT"])
    def test_target_parity(self, tgt_type):
        ref, cwd = self._reference_backdoor()
        try:
            ref_trig = ref.get_trigger(type="BOX_14", channel=3, image_size=32)
            ref_tgt = ref.get_target(type=tgt_type, trigger=ref_trig).numpy().transpose(1, 2, 0)
        finally:
            os.chdir(cwd)
        bd = Backdoor()
        ours = bd.get_target(tgt_type, trigger=bd.get_trigger("BOX_14", channel=3, image_size=32))
        if tgt_type in ("HAT", "CAT"):
            mismatch = np.abs(ours - ref_tgt) > 0.05
            assert mismatch.mean() < 0.05, f"{tgt_type}: {mismatch.mean():.3f} pixels differ"
        else:
            np.testing.assert_allclose(ours, ref_tgt, atol=1e-6)


class TestDatasetLoader:
    def make(self, **kw):
        kw.setdefault("batch_size", 16)
        kw.setdefault("fake_size", 64)
        dsl = DatasetLoader(DatasetLoader.FAKE, **kw)
        return dsl.set_poison("BOX_14", "CORNER", clean_rate=1.0, poison_rate=0.25).prepare_dataset()

    def test_fixed_split_proportions(self):
        dsl = self.make()
        assert len(dsl) == 64
        assert (~dsl._is_clean).sum() == 16  # 25% poisoned

    def test_batch_schema_and_shapes(self):
        dsl = self.make()
        batch = next(dsl.epoch_batches(0))
        assert batch["image_u8"].shape == (16, 32, 32, 3)
        assert batch["image_u8"].dtype == np.uint8
        assert batch["is_clean"].dtype == np.bool_
        assert batch["label"].shape == (16,)

    def test_epoch_determinism(self):
        dsl = self.make()
        a = next(dsl.epoch_batches(3))
        b = next(dsl.epoch_batches(3))
        np.testing.assert_array_equal(a["image_u8"], b["image_u8"])
        c = next(dsl.epoch_batches(4))
        assert np.abs(a["image_u8"].astype(int) - c["image_u8"].astype(int)).max() > 0

    def test_poison_batch_device_matches_host(self):
        import jax.numpy as jnp

        dsl = self.make()
        batch = next(dsl.epoch_batches(0))
        host = poison_batch_host(
            batch["image_u8"], batch["is_clean"], dsl.trigger, dsl.target, dsl.mask
        )
        img, R, tgt = poison_batch(
            jnp.asarray(batch["image_u8"]), jnp.asarray(batch["is_clean"]),
            jnp.asarray(dsl.trigger), jnp.asarray(dsl.target), jnp.asarray(dsl.mask),
        )
        np.testing.assert_allclose(np.asarray(img), host["image"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(R), host["pixel_values"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(tgt), host["target"], atol=1e-6)

    def test_record_semantics(self):
        dsl = self.make()
        clean_idx = int(np.nonzero(dsl._is_clean)[0][0])
        poison_idx = int(np.nonzero(~dsl._is_clean)[0][0])
        clean = dsl.get_sample(clean_idx)
        assert np.all(clean["pixel_values"] == 0)  # R = 0 for clean rows
        np.testing.assert_allclose(clean["target"], clean["image"])
        poison = dsl.get_sample(poison_idx)
        # trigger region stamped: equals trigger values there
        np.testing.assert_allclose(poison["pixel_values"][16:30, 16:30], dsl.trigger[16:30, 16:30], atol=1e-6)
        np.testing.assert_allclose(poison["target"], dsl.target, atol=1e-6)

    def test_flex_mode(self):
        dsl = DatasetLoader(DatasetLoader.FAKE, batch_size=8, fake_size=64)
        dsl.set_poison("BOX_14", "CORNER", clean_rate=0.5, poison_rate=0.25)
        dsl.prepare_dataset(mode=DatasetLoader.MODE_FLEX)
        assert len(dsl) == 48  # 32 clean + 16 poison
        assert (~dsl._is_clean).sum() == 16

    def test_flex_overflow_raises(self):
        dsl = DatasetLoader(DatasetLoader.FAKE, fake_size=64)
        dsl.set_poison("BOX_14", "CORNER", clean_rate=0.9, poison_rate=0.5)
        with pytest.raises(ValueError):
            dsl.prepare_dataset(mode=DatasetLoader.MODE_FLEX)

    def test_drop_last(self):
        dsl = DatasetLoader(DatasetLoader.FAKE, batch_size=30, fake_size=64)
        dsl.set_poison("BOX_14", "CORNER", poison_rate=0.1).prepare_dataset()
        batches = list(dsl.epoch_batches(0))
        assert len(batches) == 2  # 64 // 30, last partial dropped
        assert all(b["image_u8"].shape[0] == 30 for b in batches)

    def test_device_prefetch(self):
        from baddiffusion_tpu.data import device_prefetch

        dsl = self.make()
        out = list(device_prefetch(dsl.epoch_batches(0), size=2))
        assert len(out) == 4
        assert out[0]["image_u8"].shape == (16, 32, 32, 3)


def _write_idx(path: str, images: np.ndarray) -> None:
    """Serialize [N, H, W] uint8 images as an IDX3 file (optionally .gz)."""
    import struct

    n, h, w = images.shape
    payload = struct.pack(">IIII", 2051, n, h, w) + images.tobytes()
    if path.endswith(".gz"):
        import gzip

        with gzip.open(path, "wb") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)


@pytest.fixture(scope="module")
def digit_root(tmp_path_factory):
    """A torchvision-layout root with synthesized MNIST (plain IDX) and
    FashionMNIST (gzip IDX) training files — 150 digit-like images each,
    covering every index the reference uses (3, 6, 0, 144)."""
    root = tmp_path_factory.mktemp("digits")
    rng = np.random.RandomState(7)
    for folder, gz in (("MNIST", False), ("FashionMNIST", True)):
        imgs = np.zeros((150, 28, 28), np.uint8)
        for i in range(150):
            # blob strokes on black background, like a digit silhouette
            canvas = np.zeros((28, 28), np.float32)
            for _ in range(4):
                cy, cx = rng.randint(4, 24, size=2)
                yy, xx = np.mgrid[0:28, 0:28]
                canvas += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * rng.uniform(2, 9)))
            imgs[i] = (np.clip(canvas, 0, 1) * 255).astype(np.uint8)
        raw = root / folder / "raw"
        raw.mkdir(parents=True)
        _write_idx(str(raw / ("train-images-idx3-ubyte" + (".gz" if gz else ""))), imgs)
    return str(root)


class TestIDXReader:
    def test_roundtrip_plain_and_gzip(self, tmp_path):
        from baddiffusion_tpu.data.triggers import read_idx_images

        imgs = np.arange(3 * 28 * 28, dtype=np.uint64).reshape(3, 28, 28).astype(np.uint8)
        for name in ("a.idx", "b.idx.gz"):
            p = str(tmp_path / name)
            _write_idx(p, imgs)
            np.testing.assert_array_equal(read_idx_images(p), imgs)

    def test_bad_magic_raises(self, tmp_path):
        from baddiffusion_tpu.data.triggers import read_idx_images

        p = str(tmp_path / "bad.idx")
        with open(p, "wb") as f:
            f.write(b"\x00\x00\x08\x01" + b"\x00" * 16)
        with pytest.raises(ValueError, match="magic"):
            read_idx_images(p)

    def test_missing_data_error_message(self, tmp_path, monkeypatch):
        from baddiffusion_tpu.data.triggers import load_digit_train_image

        # the fallback path does `from datasets import load_dataset` — a ~20 s
        # cold import that dominated this test's wall time; a stub module
        # exercises the same try/except→RuntimeError logic without it
        stub = types.ModuleType("datasets")

        def _no_dataset(*a, **k):
            raise FileNotFoundError("no local HF cache (stub)")

        stub.load_dataset = _no_dataset
        monkeypatch.setitem(sys.modules, "datasets", stub)
        with pytest.raises(RuntimeError, match="staged"):
            load_digit_train_image("mnist", 0, str(tmp_path))


@pytest.mark.reference
class TestDigitTriggerParityVsReference:
    """17/17 trigger coverage: the MNIST/FASHION digit triggers against the
    reference factory running on identical IDX bytes (reference
    dataset.py:527-548; SHOE target :644-647)."""

    def _reference_backdoor(self, root):
        import sys

        from tests.torchvision_shim import install

        install()
        sys.path.insert(0, "/root/reference")
        cwd = os.getcwd()
        os.chdir("/root/reference")
        from dataset import Backdoor as RefBackdoor

        return RefBackdoor(root=root), cwd

    @pytest.mark.parametrize("trig_type", ["MNIST", "MNIST_EZ", "FASHION", "FASHION_EZ"])
    @pytest.mark.parametrize("channel", [1, 3])
    def test_digit_trigger_parity(self, digit_root, trig_type, channel):
        ref, cwd = self._reference_backdoor(digit_root)
        try:
            ref_trig = ref.get_trigger(type=trig_type, channel=channel, image_size=32)
        finally:
            os.chdir(cwd)
        ref_trig = ref_trig.numpy().transpose(1, 2, 0)
        ours = Backdoor(root=digit_root).get_trigger(trig_type, channel=channel, image_size=32)
        # 2e-5 float32 noise: the reference normalizes via util.normalize's
        # linear remap, ours via x*2-1 (same map, different op order)
        np.testing.assert_allclose(ours, ref_trig, atol=5e-5)

    def test_shoe_target_parity(self, digit_root):
        ref, cwd = self._reference_backdoor(digit_root)
        try:
            ref_trig = ref.get_trigger(type="BOX_14", channel=3, image_size=32)
            ref_tgt = ref.get_target(type="SHOE", trigger=ref_trig).numpy().transpose(1, 2, 0)
        finally:
            os.chdir(cwd)
        bd = Backdoor(root=digit_root)
        ours = bd.get_target("SHOE", trigger=bd.get_trigger("BOX_14", channel=3, image_size=32))
        np.testing.assert_allclose(ours, ref_tgt, atol=5e-5)


def _make_pil_images(n, size, gray=False, seed=11):
    from PIL import Image

    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        if gray:
            out.append(Image.fromarray(rng.randint(0, 255, (size, size), dtype=np.uint8).astype(np.uint8), mode="L"))
        else:
            out.append(Image.fromarray(rng.randint(0, 255, (size, size, 3), dtype=np.uint8).astype(np.uint8), mode="RGB"))
    return out


class TestHFDatasetPath:
    """Executes the real `_decode_hf_dataset` machinery (reference contract:
    dataset.py:79-92 — train+test merged, channel/size normalization) against
    genuine `datasets.Dataset` objects, offline."""

    def test_decode_merges_train_and_test(self, monkeypatch):
        import datasets as hfds

        from baddiffusion_tpu.data.datasets import _decode_hf_dataset

        train = hfds.Dataset.from_dict({"img": _make_pil_images(6, 32), "label": list(range(6))})
        test = hfds.Dataset.from_dict({"img": _make_pil_images(4, 32, seed=12), "label": [9] * 4})

        def fake_load(name, split):
            assert name == "cifar10"
            return {"train": train, "test": test}[split]

        monkeypatch.setattr("datasets.load_dataset", fake_load)
        out = _decode_hf_dataset("CIFAR10", size=32, channel=3)
        assert out["images"].shape == (10, 32, 32, 3)
        assert out["images"].dtype == np.uint8
        assert list(out["labels"][:6]) == [0, 1, 2, 3, 4, 5]
        # byte-faithful decode (no resize needed at native size)
        np.testing.assert_array_equal(out["images"][0], np.asarray(train[0]["img"]))

    def test_decode_grayscale_resize(self, monkeypatch):
        import datasets as hfds

        from baddiffusion_tpu.data.datasets import _decode_hf_dataset

        train = hfds.Dataset.from_dict({"image": _make_pil_images(3, 28, gray=True)})
        test = hfds.Dataset.from_dict({"image": _make_pil_images(2, 28, gray=True, seed=5)})
        monkeypatch.setattr("datasets.load_dataset", lambda name, split: {"train": train, "test": test}[split])
        out = _decode_hf_dataset("MNIST", size=32, channel=1)
        assert out["images"].shape == (5, 32, 32, 1)
        assert np.all(out["labels"] == -1)  # no label column

    def test_ram_cap_spills_to_disk(self, monkeypatch, tmp_path):
        """Above the RAM cap the HF decode streams into a .npy memmap cache
        instead of raising (round-2 behavior) — LSUN-scale sets become
        loadable with bounded host RAM."""
        import datasets as hfds

        from baddiffusion_tpu.data.datasets import _decode_hf_dataset

        train = hfds.Dataset.from_dict({"img": _make_pil_images(2, 8)})
        monkeypatch.setattr("datasets.load_dataset", lambda name, split: train)
        out = _decode_hf_dataset("CELEBA-HQ", size=256, channel=3, max_ram_bytes=1024, root=str(tmp_path))
        assert isinstance(out["images"], np.memmap)
        assert out["images"].shape == (2, 256, 256, 3)
        # eager decode of the same records matches the spilled bytes
        ram = _decode_hf_dataset("CELEBA-HQ", size=256, channel=3, max_ram_bytes=1 << 30, root=str(tmp_path))
        np.testing.assert_array_equal(np.asarray(out["images"]), ram["images"])

    def test_dataset_loader_end_to_end_over_hf(self, monkeypatch):
        """DatasetLoader('MNIST') through decode → poison → batches."""
        import datasets as hfds

        train = hfds.Dataset.from_dict(
            {"image": _make_pil_images(20, 28, gray=True), "label": list(range(10)) * 2}
        )
        test = hfds.Dataset.from_dict({"image": _make_pil_images(12, 28, gray=True, seed=3), "label": list(range(12))})
        monkeypatch.setattr("datasets.load_dataset", lambda name, split: {"train": train, "test": test}[split])
        dsl = DatasetLoader("MNIST", batch_size=8)
        dsl.set_poison("BOX_14", "CORNER", poison_rate=0.25).prepare_dataset()
        assert len(dsl) == 32 and dsl.channel == 1 and dsl.image_size == 32
        batch = next(dsl.epoch_batches(0))
        assert batch["image_u8"].shape == (8, 32, 32, 1)
        assert (~dsl._is_clean).sum() == 8

    def test_load_from_disk_staging(self, tmp_path, monkeypatch):
        """A `save_to_disk` directory under the dataset root is preferred —
        the offline staging path for real datasets."""
        import datasets as hfds

        def boom(*a, **k):
            raise AssertionError("load_dataset must not be called when staged on disk")

        monkeypatch.setattr("datasets.load_dataset", boom)
        dd = hfds.DatasetDict(
            {
                "train": hfds.Dataset.from_dict({"img": _make_pil_images(6, 32), "label": [0] * 6}),
                "test": hfds.Dataset.from_dict({"img": _make_pil_images(2, 32, seed=9), "label": [1] * 2}),
            }
        )
        dd.save_to_disk(str(tmp_path / "CIFAR10"))
        dsl = DatasetLoader("CIFAR10", root=str(tmp_path), batch_size=4)
        assert len(dsl._images) == 8
        assert dsl._images.shape == (8, 32, 32, 3)

    def test_stage_fake_datasets_script(self, tmp_path):
        """The staging helper (examples/stage_fake_datasets.py) produces
        save_to_disk dirs with the real hub schemas that DatasetLoader then
        consumes through the production load path."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "stage_fake_datasets",
            os.path.join(os.path.dirname(__file__), "..", "examples", "stage_fake_datasets.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        for name, channel, size in (("CIFAR10", 3, 32), ("MNIST", 1, 32)):
            mod.stage(name, str(tmp_path), n=12)
            dsl = DatasetLoader(name, root=str(tmp_path), batch_size=4)
            assert dsl._images.shape == (12, size, size, channel)
            assert dsl._images.dtype == np.uint8
            assert dsl._labels.shape == (12,)


class TestHFSplitMethod:
    """split_method='hf': membership is bit-exact vs the installed HF
    datasets `train_test_split(seed)` (the reference calls it UNSEEDED —
    dataset.py:182,232 — so its own membership varies run to run; this is the
    strongest reproducible form of SURVEY §7 hard part (c))."""

    def _loader(self, **kw):
        kw.setdefault("batch_size", 8)
        kw.setdefault("fake_size", 40)
        return DatasetLoader(DatasetLoader.FAKE, **kw)

    def test_fixed_membership_matches_hf(self):
        import datasets as hfds

        dsl = self._loader(seed=123).set_poison("BOX_14", "CORNER", poison_rate=0.3)
        dsl.prepare_dataset(split_method="hf")
        dd = hfds.Dataset.from_dict({"i": list(range(40))}).train_test_split(test_size=12, seed=123)
        expected_poison = set(dd["test"]["i"])
        got_poison = set(np.nonzero(~dsl._is_clean)[0].tolist())
        assert got_poison == expected_poison

    def test_flex_membership_and_order_match_hf(self):
        import datasets as hfds

        base = self._loader(seed=5)
        raw = base._images.copy()
        dsl = base.set_poison("BOX_14", "CORNER", clean_rate=0.5, poison_rate=0.25)
        dsl.prepare_dataset(mode=DatasetLoader.MODE_FLEX, split_method="hf")
        dd = hfds.Dataset.from_dict({"i": list(range(40))}).train_test_split(train_size=20, test_size=10, seed=5)
        assert len(dsl) == 30
        np.testing.assert_array_equal(dsl._images[:20], raw[np.asarray(dd["train"]["i"])])
        np.testing.assert_array_equal(dsl._images[20:], raw[np.asarray(dd["test"]["i"])])
        assert dsl._is_clean[:20].all() and not dsl._is_clean[20:].any()

    def test_fixed_trivial_rates_skip_split(self):
        dsl = self._loader().set_poison("BOX_14", "CORNER", poison_rate=1.0)
        dsl.prepare_dataset(split_method="hf")
        assert not dsl._is_clean.any()

    def test_flex_zero_sized_side(self):
        """HF train_test_split rejects a zero-sized side; the hf split method
        must handle clean_n or poison_n rounding to 0 like the seeded path
        (e.g. the DEFAULT poison_rate 0.007 on a small dataset)."""
        for cr, pr, want_n, want_poison in (
            (0.5, 0.0, 20, 0),
            (0.0, 0.25, 10, 10),
            (1.0, 0.0, 40, 0),
            (1.0, 0.007, 40, 0),  # int(40*0.007) == 0
        ):
            dsl = self._loader().set_poison("BOX_14", "CORNER", clean_rate=cr, poison_rate=pr)
            dsl.prepare_dataset(mode=DatasetLoader.MODE_FLEX, split_method="hf")
            assert len(dsl) == want_n
            assert int((~dsl._is_clean).sum()) == want_poison

    def test_unknown_method_raises(self):
        dsl = self._loader().set_poison("BOX_14", "CORNER", poison_rate=0.2)
        with pytest.raises(ValueError, match="split_method"):
            dsl.prepare_dataset(split_method="bogus")


class TestStreamingStore:
    """Disk-backed (memmap) dataset path: selected automatically above the
    RAM cap, bitwise-identical batches, no materialization under FLEX/label
    filtering (the reference bounds RAM with lazy per-batch decode,
    dataset.py:195-201,271-273; here: decode-once .npy cache + OS page
    cache)."""

    def test_mmap_forced_path_matches_ram(self, tmp_path):
        ram = DatasetLoader(DatasetLoader.FAKE, image_size=16, batch_size=8, fake_size=32)
        mm = DatasetLoader(
            DatasetLoader.FAKE, image_size=16, batch_size=8, fake_size=32,
            root=str(tmp_path), max_ram_bytes=1,
        )
        assert not ram.is_memmap_backed
        assert mm.is_memmap_backed
        for d in (ram, mm):
            d.set_poison("BOX_8", "CORNER", poison_rate=0.5).prepare_dataset()
        for a, b in zip(ram.epoch_batches(0), mm.epoch_batches(0)):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    def test_mmap_cache_reused_and_validated(self, tmp_path):
        mk = lambda: DatasetLoader(
            DatasetLoader.FAKE, image_size=16, batch_size=8, fake_size=32,
            root=str(tmp_path), max_ram_bytes=1,
        )
        a, b = mk(), mk()  # second construction must reuse the cache file
        cache_dir = tmp_path / ".decoded"
        assert len(list(cache_dir.glob("*.npy"))) == 1
        np.testing.assert_array_equal(np.asarray(a._store), np.asarray(b._store))

    def test_flex_and_label_filter_stay_memmap(self, tmp_path):
        mm = DatasetLoader(
            DatasetLoader.FAKE, image_size=16, batch_size=4, fake_size=32,
            root=str(tmp_path), max_ram_bytes=1,
        )
        mm.set_poison("BOX_8", "CORNER", clean_rate=0.5, poison_rate=0.25)
        mm.prepare_dataset(mode=DatasetLoader.MODE_FLEX)
        assert mm.is_memmap_backed  # subsetting went through _index only
        assert len(mm) == 24
        batch = next(mm.epoch_batches(0))
        assert batch["image_u8"].shape == (4, 16, 16, 1 if mm.channel == 1 else mm.channel)

    def test_images_property_identity_alias_and_memmap_guard(self, tmp_path):
        """_images is an alias (no copy) while the index is the identity, and
        refuses to materialize a SUBSETTED memmap-backed store in RAM — the
        exact multi-GB gather the _index indirection exists to avoid."""
        import pytest

        ram = DatasetLoader(DatasetLoader.FAKE, image_size=16, batch_size=8, fake_size=32)
        assert ram._images is ram._store  # identity → alias, not an O(n) copy

        mm = DatasetLoader(
            DatasetLoader.FAKE, image_size=16, batch_size=4, fake_size=32,
            root=str(tmp_path), max_ram_bytes=1,
        )
        assert mm._images is mm._store  # identity index: alias is safe
        mm.set_poison("BOX_8", "CORNER", clean_rate=0.5, poison_rate=0.25)
        mm.prepare_dataset(mode=DatasetLoader.MODE_FLEX)  # subsets _index
        with pytest.raises(RuntimeError, match="materialize"):
            _ = mm._images

        # in-RAM subsetted store still materializes (small datasets / tests)
        ram2 = DatasetLoader(DatasetLoader.FAKE, image_size=16, batch_size=4, fake_size=32)
        ram2.set_poison("BOX_8", "CORNER", clean_rate=0.5, poison_rate=0.25)
        ram2.prepare_dataset(mode=DatasetLoader.MODE_FLEX)
        assert ram2._images.shape[0] == len(ram2)

    def test_env_override_forces_mmap(self, tmp_path, monkeypatch):
        monkeypatch.setenv("BADDIFF_MAX_RAM_BYTES", "1")
        mm = DatasetLoader(
            DatasetLoader.FAKE, image_size=16, batch_size=8, fake_size=32, root=str(tmp_path)
        )
        assert mm.is_memmap_backed

    def test_concurrent_builders_do_not_corrupt_cache(self, tmp_path):
        """Two processes building the same cache concurrently must both
        succeed with intact bytes: the scratch file is pid-unique, so neither
        open truncates the other's live mapping (os.replace is atomic)."""
        import subprocess
        import sys

        prog = (
            "import numpy as np\n"
            "from baddiffusion_tpu.data.datasets import _build_memmap\n"
            "import time\n"
            "def fill(out):\n"
            "    out[:] = 7\n"
            "    time.sleep(1.0)\n"  # hold the scratch file open across the peer's build
            f"store = _build_memmap({str(repr(str(tmp_path / 'c.npy')))}, (64, 16, 16, 1), fill)\n"
            "assert (np.asarray(store) == 7).all()\n"
        )
        procs = [
            subprocess.Popen([sys.executable, "-c", prog], cwd="/root/repo",
                             stdout=subprocess.PIPE, stderr=subprocess.PIPE)
            for _ in range(2)
        ]
        for p in procs:
            # generous: each subprocess cold-imports jax (~15 s unloaded) and
            # the suite may be running on an oversubscribed box
            _, err = p.communicate(timeout=300)
            assert p.returncode == 0, err.decode()
        store = np.load(tmp_path / "c.npy", mmap_mode="r")
        assert store.shape == (64, 16, 16, 1) and (np.asarray(store) == 7).all()
        assert not list(tmp_path.glob("c.npy.tmp*"))  # scratch files cleaned up

    def test_small_runs_leave_no_stray_decoded_dir(self, tmp_path):
        """In-RAM loads must not create '<root>/.decoded/' as a side effect
        (every smoke/bench run constructs a small FAKE loader in cwd)."""
        DatasetLoader(
            DatasetLoader.FAKE, image_size=16, batch_size=8, fake_size=32,
            root=str(tmp_path),
        )
        assert not (tmp_path / ".decoded").exists()

    def test_peer_wait_falls_back_to_local_build(self, tmp_path, monkeypatch):
        """Per-host dataset roots: a non-primary process polling for process
        0's cache sees NO builder scratch file — it must fall back to its own
        local decode instead of deadlocking (the run dir is shared on a pod,
        the dataset root often is not)."""
        import jax

        from baddiffusion_tpu.data.datasets import _build_memmap

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        cache = str(tmp_path / ".decoded" / "x.npy")

        def fill(out):
            out[:] = 3

        store = _build_memmap(cache, (8, 4, 4, 1), fill)  # returns, no 24h hang
        assert (np.asarray(store) == 3).all()

    def test_peer_wait_picks_up_shared_build(self, tmp_path):
        """Shared dataset roots: while a builder's scratch file is visible and
        heartbeating (mtime advances — size CANNOT advance: open_memmap
        preallocates the file to its final size), the peer keeps waiting and
        adopts the installed cache instead of decoding a duplicate."""
        import threading
        import time as _time

        from baddiffusion_tpu.data.datasets import _wait_for_peer_cache

        tmp_path.joinpath(".decoded").mkdir()
        cache = str(tmp_path / ".decoded" / "y.npy")
        scratch = cache + ".tmp.999"

        # preallocated scratch, CONSTANT size — exactly like open_memmap
        with open(scratch, "wb") as f:
            f.write(b"\0" * 4096)

        def builder():
            _time.sleep(1.5)
            os.utime(scratch)  # heartbeat: mtime advances, size doesn't
            np.save(open(cache + ".part", "wb"), np.zeros((2, 2), np.uint8))
            os.replace(cache + ".part", cache)
            os.remove(scratch)

        t = threading.Thread(target=builder)
        t0 = _time.monotonic()
        t.start()
        _wait_for_peer_cache(cache, grace_s=0.5, stall_s=30.0)
        t.join()
        assert os.path.exists(cache)
        # it genuinely waited past the grace window for the visible builder
        assert _time.monotonic() - t0 > 1.0

    def test_builder_heartbeats_preallocated_scratch(self, tmp_path, monkeypatch):
        """The builder must advertise liveness via mtime heartbeats on its
        preallocated (constant-size) scratch file; without them a peer's
        stall detection would declare the builder dead mid-decode and kick
        off an N-fold duplicate build."""
        import time as _time

        import baddiffusion_tpu.data.datasets as dsmod

        monkeypatch.setattr(dsmod, "_HEARTBEAT_S", 0.05)
        cache = str(tmp_path / ".decoded" / "hb.npy")
        seen = {}

        def fill(out):
            tmp = cache + f".tmp.{os.getpid()}"
            assert os.path.getsize(tmp) >= out.nbytes  # preallocated to final size
            m0 = os.path.getmtime(tmp)
            _time.sleep(0.5)  # several heartbeat periods
            seen["mtime_advanced"] = os.path.getmtime(tmp) > m0
            out[:] = 1

        dsmod._build_memmap(cache, (4, 2, 2, 1), fill)
        assert seen["mtime_advanced"]

    def test_restaged_dataset_invalidates_decode_cache(self, tmp_path):
        """Restaging a same-count dataset with different pixels must NOT be
        served from the old decode cache: the HF fingerprint keys the cache."""
        import datasets as hfds

        from baddiffusion_tpu.data.datasets import _decode_hf_dataset

        root = tmp_path / "datasets"
        stage = root / "CELEBA-HQ"
        hfds.Dataset.from_dict({"image": _make_pil_images(2, 8)}).save_to_disk(str(stage))
        old = _decode_hf_dataset("CELEBA-HQ", size=16, channel=3, max_ram_bytes=1, root=str(root))
        old_images = np.asarray(old["images"]).copy()

        import shutil

        shutil.rmtree(stage)
        hfds.Dataset.from_dict({"image": _make_pil_images(2, 8, seed=99)}).save_to_disk(str(stage))
        new = _decode_hf_dataset("CELEBA-HQ", size=16, channel=3, max_ram_bytes=1, root=str(root))
        assert not np.array_equal(np.asarray(new["images"]), old_images)


class TestRealImageSample:
    def test_matches_hf_shuffle_membership(self):
        """real_image_sample must reproduce the reference's measure dump
        membership: ds.shuffle(seed) then first n (baddiffusion.py:489)."""
        import datasets as hfds

        dsl = DatasetLoader(DatasetLoader.FAKE, image_size=16, batch_size=8, fake_size=24, seed=7)
        dsl.set_poison("BOX_8", "CORNER", poison_rate=0.25).prepare_dataset()
        got = dsl.real_image_sample(10)
        ds = hfds.Dataset.from_dict({"i": list(range(24))}).shuffle(seed=7)
        want_idx = np.asarray(ds["i"][:10])
        np.testing.assert_array_equal(got, dsl._store[dsl._index[want_idx]])


class TestLSUNStagedPath:
    """LSUN-CHURCH/LSUN-BEDROOM are staged-only (the reference declares them
    in its defaults tables but its __load_dataset raises for them too,
    dataset.py:79-92): a save_to_disk dir under {root}/{NAME} loads; absent
    staging raises with staging guidance rather than a bare
    NotImplementedError."""

    def test_staged_lsun_loads(self, tmp_path):
        import datasets as hfds

        ds = hfds.Dataset.from_dict({"image": _make_pil_images(6, 64)})
        ds.save_to_disk(str(tmp_path / "LSUN-CHURCH"))
        dsl = DatasetLoader(
            DatasetLoader.LSUN_CHURCH, root=str(tmp_path), image_size=32, batch_size=2
        )
        assert dsl.channel == 3 and len(dsl) == 6
        dsl.set_poison("BOX_14", "CORNER", poison_rate=0.5).prepare_dataset()
        batch = next(dsl.epoch_batches(0))
        assert batch["image_u8"].shape == (2, 32, 32, 3)

    def test_unstaged_lsun_raises_with_guidance(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="save_to_disk"):
            DatasetLoader(DatasetLoader.LSUN_BEDROOM, root=str(tmp_path), image_size=32)


def test_prepare_dataset_requires_set_poison_all_paths():
    """Every prepare_dataset path (FIXED/FLEX × seeded/hf) must raise the
    friendly ValueError when set_poison was skipped — not float(None)."""
    import pytest

    for mode, split in [("FIXED", "seeded"), ("FLEX", "seeded"), ("FIXED", "hf"), ("FLEX", "hf")]:
        dsl = DatasetLoader(DatasetLoader.FAKE, image_size=16, batch_size=8, fake_size=16)
        with pytest.raises(ValueError, match="set_poison"):
            dsl.prepare_dataset(mode=mode, split_method=split)
