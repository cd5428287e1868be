"""Poisoned dataset builder + host batch pipeline.

Capability parity with the reference `DatasetLoader` (`dataset.py:28-377`):
MNIST/CIFAR10/CELEBA/CELEBA-HQ with channel/size defaults (1×32 / 3×32 / 3×64 /
3×256, dataset.py:94-118), [-1,1] normalization, FIXED mode (poison_rate slice
of a seeded shuffle, dataset.py:162-201) and FLEX mode (independent clean /
poison fractions, dataset.py:225-244), per-record clean-vs-backdoor transform
(dataset.py:278-319), horizontal-flip augmentation (always on, matching the
reference's quirk #3), and label filtering.

TPU-native split of labor: this module only decodes/shuffles/flips uint8 on
the host and ships ``{image_u8, is_clean, label}``; normalization + trigger
compositing happen on device (`data/poison.py`). Also provides ``FAKE`` — a
deterministic procedural dataset so everything runs with zero network egress.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence, Union

import numpy as np

from baddiffusion_tpu.data.triggers import DEFAULT_VMAX, DEFAULT_VMIN, Backdoor, trigger_mask
from baddiffusion_tpu.utils.logging import Log

DEFAULT_CHANNELS = {"MNIST": 1, "CIFAR10": 3, "CELEBA": 3, "CELEBA-HQ": 3, "LSUN-CHURCH": 3, "LSUN-BEDROOM": 3, "FAKE": 3}
DEFAULT_SIZES = {"MNIST": 32, "CIFAR10": 32, "CELEBA": 64, "CELEBA-HQ": 256, "LSUN-CHURCH": 256, "LSUN-BEDROOM": 256, "FAKE": 32}
HF_NAMES = {"MNIST": "mnist", "CIFAR10": "cifar10", "CELEBA": "student/celebA", "CELEBA-HQ": "huggan/CelebA-HQ"}


def _fake_images(n: int, size: int, channel: int, seed: int = 1234, out=None) -> np.ndarray:
    """Deterministic procedural images: smooth color gradients + a bright
    blob, enough structure for the loss/metrics to be meaningful offline.
    ``out`` (uint8 [n,size,size,channel], e.g. a memmap) lets arbitrarily
    large datasets stream to disk without a full-size RAM buffer; the pixel
    values are identical either way (same per-image RNG draw order)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / max(size - 1, 1)
    if out is None:
        out = np.zeros((n, size, size, channel), np.uint8)
    img = np.zeros((size, size, channel), np.float32)
    for i in range(n):
        freq = rng.uniform(0.5, 3.0, size=(channel,))
        phase = rng.uniform(0, 2 * np.pi, size=(channel, 2))
        cx, cy, r = rng.uniform(0.2, 0.8), rng.uniform(0.2, 0.8), rng.uniform(0.1, 0.3)
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r**2)))
        for c in range(channel):
            wave = 0.5 + 0.25 * np.sin(2 * np.pi * freq[c] * xx + phase[c, 0]) * np.cos(
                2 * np.pi * freq[c] * yy + phase[c, 1]
            )
            img[:, :, c] = np.clip(wave + 0.4 * blob, 0, 1)
        out[i] = (img * 255).round().astype(np.uint8)
    return out


def _mmap_cache_path(root: Optional[str], key: str) -> str:
    """Path of the one-time decode cache (<root>/.decoded/<key>.npy).

    Pure path math — the directory is created in ``_build_memmap`` only when
    a cache is actually written, so small in-RAM runs (every smoke test and
    bench) leave no stray ``.decoded/`` dirs behind."""
    return os.path.join(root or "datasets", ".decoded", key + ".npy")


_HEARTBEAT_S = 5.0  # builder re-touches its scratch file this often


def _touch_periodically(path: str, stop) -> None:
    """Builder heartbeat: bump ``path``'s mtime every ``_HEARTBEAT_S`` until
    the ``stop`` event is set. File size is useless as a liveness signal —
    ``np.lib.format.open_memmap`` preallocates the scratch file to its final
    size at creation — and mmap writes don't reliably update mtime, so the
    builder advertises liveness explicitly. If the builder process dies, the
    heartbeats stop and peers' stall detection fires."""
    while not stop.wait(_HEARTBEAT_S):
        try:
            os.utime(path)
        except OSError:  # scratch already renamed/removed — builder finished
            return


def _wait_for_peer_cache(cache: str, grace_s: float = 15.0, stall_s: float = 180.0) -> None:
    """Non-primary processes: wait for another process's decode cache, but
    only while one is observably alive. Returns (rather than raising) as soon
    as waiting is pointless; the caller then builds locally.

    - shared dataset root: a builder's ``<cache>.tmp.<pid>`` scratch file is
      visible and its mtime advances (the builder heartbeats it every
      ``_HEARTBEAT_S``; size can't advance — the memmap is preallocated) →
      keep waiting until ``os.replace`` installs the cache (or the heartbeat
      stops for ``stall_s``: builder died or wedged).
    - per-host dataset root: nothing ever appears → return after ``grace_s``
      so the peer decodes its own local copy instead of deadlocking."""
    import glob as _glob
    import time

    deadline_grace = time.monotonic() + grace_s
    last_progress = time.monotonic()
    last_mtime = -1.0
    while not os.path.exists(cache):
        mtimes = []
        for p in _glob.glob(cache + ".tmp.*"):
            try:
                mtimes.append(os.path.getmtime(p))
            except OSError:  # builder just renamed/removed it
                pass
        if mtimes:
            if max(mtimes) != last_mtime:
                last_mtime = max(mtimes)
                last_progress = time.monotonic()
            if time.monotonic() - last_progress > stall_s:
                return  # heartbeat stopped — builder died/wedged, build locally
        elif time.monotonic() > deadline_grace:
            return  # no builder visible — per-host root, build locally
        time.sleep(1.0)


def _build_memmap(cache: str, shape, fill) -> np.ndarray:
    """Decode-once → read-forever: ``fill(out)`` writes into a fresh .npy
    memmap (atomically installed via os.replace), then the store is reopened
    read-only with mmap — the OS page cache streams batches, so host RAM
    stays bounded at any dataset size (the reference achieves the same bound
    with lazy per-batch decode, dataset.py:195-201,271-273).

    Concurrency: the scratch file is pid-unique so concurrent builders never
    truncate each other's live mapping (os.replace is atomic; last writer
    wins). Under jax.distributed, peers first wait for a visible builder's
    cache (shared dataset root: process 0's ``.tmp.<pid>`` scratch file is
    observable and heartbeating — see ``_touch_periodically``); when no
    builder is visible or its heartbeat stops — the former is the normal
    case when the dataset root is staged per host, where process 0's files
    never appear on this host's disk — the peer decodes locally. Duplicate
    builds are wasted work, never corruption."""
    if not os.path.exists(cache):
        import jax

        if jax.process_count() > 1 and jax.process_index() != 0:
            _wait_for_peer_cache(cache)
        if not os.path.exists(cache):
            import threading

            tmp = f"{cache}.tmp.{os.getpid()}"
            stop_heartbeat = threading.Event()
            heartbeat = None
            try:
                os.makedirs(os.path.dirname(cache), exist_ok=True)
                out = np.lib.format.open_memmap(tmp, mode="w+", dtype=np.uint8, shape=shape)
                # advertise liveness to peers polling on a shared root (the
                # preallocated file's size never changes; mtime heartbeats do)
                heartbeat = threading.Thread(
                    target=_touch_periodically, args=(tmp, stop_heartbeat), daemon=True
                )
                heartbeat.start()
                fill(out)
                out.flush()
                del out
                os.replace(tmp, cache)
            finally:
                stop_heartbeat.set()
                if heartbeat is not None:
                    heartbeat.join()
                if os.path.exists(tmp):
                    os.remove(tmp)
    store = np.load(cache, mmap_mode="r")
    if store.shape != tuple(shape):
        raise ValueError(
            f"stale decode cache {cache}: has {store.shape}, need {tuple(shape)}; delete it"
        )
    return store


def _load_hf_dataset(name: str, root: Optional[str] = None):
    """Resolve the HF dataset object for ``name`` (train+test merged for the
    digit/CIFAR sets, dataset.py:79-92).

    Offline staging: a `Dataset.save_to_disk` directory under
    ``{root}/{NAME}`` or ``{root}/{hf_name}`` is preferred; otherwise the HF
    datasets cache is consulted (offline mode — no downloads). Staged-only
    datasets (LSUN-CHURCH / LSUN-BEDROOM — the reference declares them but
    has no load path either, dataset.py:79-92) MUST be staged; the error
    says how."""
    os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    import datasets as hfds

    hf_name = HF_NAMES.get(name)
    merge_test = name in ("MNIST", "CIFAR10")

    cands = [] if root is None else [os.path.join(root, name)]
    if root is not None and hf_name is not None:
        cands.append(os.path.join(root, hf_name.replace("/", "--")))
    for cand in cands:
        if os.path.isdir(cand) and (
            os.path.exists(os.path.join(cand, "dataset_info.json"))
            or os.path.exists(os.path.join(cand, "dataset_dict.json"))
        ):
            obj = hfds.load_from_disk(cand)
            if isinstance(obj, hfds.DatasetDict):
                parts = [obj["train"]] + ([obj["test"]] if merge_test and "test" in obj else [])
                return hfds.concatenate_datasets(parts) if len(parts) > 1 else parts[0]
            return obj
    if hf_name is None:
        raise FileNotFoundError(
            f"{name} has no hub fetch path; stage it offline with "
            f"datasets.Dataset.save_to_disk('{root or 'datasets'}/{name}') "
            "(see scripts/stage_real_assets.sh)"
        )
    if merge_test:
        return hfds.concatenate_datasets(
            [hfds.load_dataset(hf_name, split="train"), hfds.load_dataset(hf_name, split="test")]
        )
    return hfds.load_dataset(hf_name, split="train")


def _decode_hf_dataset(
    name: str, size: int, channel: int, max_ram_bytes: int = 8 << 30, root: Optional[str] = None
) -> Dict[str, np.ndarray]:
    """Load an HF dataset (train+test merged, dataset.py:79-92) and decode to
    uint8 NHWC. Decoding runs on a thread pool (PIL releases the GIL). Small
    datasets decode eagerly to RAM; above ``max_ram_bytes`` the decode
    streams once into a disk cache and the store is a read-only memmap, so
    LSUN-scale datasets train with bounded host RAM. Raises offline if not
    cached."""
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    ds = _load_hf_dataset(name, root=root)
    img_key = "img" if "img" in ds.column_names else "image"

    n = len(ds)
    if "label" in ds.column_names:
        labels = np.asarray(ds["label"], np.float32)
    else:
        labels = np.full((n,), -1, np.float32)

    def decode(rec):
        img = rec[img_key]
        img = img.convert("L") if channel == 1 else img.convert("RGB")
        if img.size != (size, size):
            img = img.resize((size, size), Image.BILINEAR)
        arr = np.asarray(img, dtype=np.uint8)
        return arr[..., None] if arr.ndim == 2 else arr

    total = n * size * size * channel
    if total > max_ram_bytes:
        def fill(out, chunk=1024):
            with ThreadPoolExecutor() as pool:
                for start in range(0, n, chunk):
                    recs = ds.select(range(start, min(start + chunk, n)))
                    out[start : start + len(recs)] = np.stack(list(pool.map(decode, recs)))

        # the HF fingerprint ties the cache to the dataset's CONTENT: restaging
        # a same-count dataset with different pixels gets a fresh cache file
        # instead of silently serving the old decode
        fp = getattr(ds, "_fingerprint", "") or ""
        fp = f"_{fp[:12]}" if fp else ""
        cache = _mmap_cache_path(root, f"{name.replace('/', '--')}_{size}x{channel}_n{n}{fp}")
        images = _build_memmap(cache, (n, size, size, channel), fill)
    else:
        with ThreadPoolExecutor() as pool:
            images = np.stack(list(pool.map(decode, ds)))  # single pass: records decode once
    return {"images": images, "labels": labels}


def _decode_image_dir(path: str, size: int, channel: int) -> Dict[str, np.ndarray]:
    from PIL import Image

    from baddiffusion_tpu.utils.image import list_image_files

    images = []
    for f in list_image_files(path):
        img = Image.open(f)
        img = img.convert("L") if channel == 1 else img.convert("RGB")
        if img.size != (size, size):
            img = img.resize((size, size), Image.BILINEAR)
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[..., None]
        images.append(arr)
    return {"images": np.stack(images), "labels": np.full((len(images),), -1, np.float32)}


class DatasetLoader:
    MODE_FIXED = "FIXED"
    MODE_FLEX = "FLEX"

    MNIST = "MNIST"
    CIFAR10 = "CIFAR10"
    CELEBA = "CELEBA"
    CELEBA_HQ = "CELEBA-HQ"
    LSUN_CHURCH = "LSUN-CHURCH"
    LSUN_BEDROOM = "LSUN-BEDROOM"
    FAKE = "FAKE"

    # batch schema keys (reference dataset.py:43-47)
    PIXEL_VALUES = "pixel_values"
    TARGET = "target"
    IS_CLEAN = "is_clean"
    IMAGE = "image"
    LABEL = "label"

    def __init__(
        self,
        name: str,
        label: Optional[Union[int, Sequence[int]]] = None,
        root: Optional[str] = None,
        channel: Optional[int] = None,
        image_size: Optional[int] = None,
        vmin: float = DEFAULT_VMIN,
        vmax: float = DEFAULT_VMAX,
        batch_size: int = 512,
        shuffle: bool = True,
        seed: int = 0,
        fake_size: int = 512,
        hflip: bool = True,
        drop_last: bool = True,
        max_ram_bytes: Optional[int] = None,
    ):
        self.name = name
        self.root = root
        self.vmin, self.vmax = vmin, vmax
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.hflip = hflip
        self.drop_last = drop_last
        self.label_filter = None if label is None else ([label] if isinstance(label, int) else list(label))
        # RAM cap for eager decode; above it the images live in a read-only
        # disk memmap (decode-once cache). Env override (BADDIFF_MAX_RAM_BYTES)
        # lets tests force the mmap path on tiny data.
        if max_ram_bytes is None:
            max_ram_bytes = int(os.environ.get("BADDIFF_MAX_RAM_BYTES", 8 << 30))
        self.max_ram_bytes = max_ram_bytes

        key = name if name in DEFAULT_CHANNELS else "FAKE"
        self.channel = channel or DEFAULT_CHANNELS.get(key, 3)
        self.image_size = image_size or DEFAULT_SIZES.get(key, 32)

        if name == self.FAKE:
            total = fake_size * self.image_size**2 * self.channel
            cache = _mmap_cache_path(root, f"FAKE_{self.image_size}x{self.channel}_n{fake_size}")
            if total > self.max_ram_bytes:
                shape = (fake_size, self.image_size, self.image_size, self.channel)
                store = _build_memmap(
                    cache, shape, lambda out: _fake_images(fake_size, self.image_size, self.channel, out=out)
                )
            elif os.path.exists(cache):
                # a prior (e.g. mmap-mode) run already generated these exact
                # bytes — load them to RAM instead of regenerating
                store = np.load(cache)
            else:
                store = _fake_images(fake_size, self.image_size, self.channel)
            self._store, self._labels_store = store, np.full((len(store),), -1, np.float32)
        elif name in HF_NAMES or name in (self.LSUN_CHURCH, self.LSUN_BEDROOM):
            # LSUN: staged save_to_disk dirs only (the reference declares the
            # names but has no load path either, dataset.py:79-92); the
            # memmap spill above the RAM cap is what makes their scale train
            data = _decode_hf_dataset(
                name, self.image_size, self.channel, max_ram_bytes=self.max_ram_bytes, root=root
            )
            self._store, self._labels_store = data["images"], data["labels"]
        elif os.path.isdir(name):
            data = _decode_image_dir(name, self.image_size, self.channel)
            self._store, self._labels_store = data["images"], data["labels"]
        else:
            raise NotImplementedError(f"Undefined dataset: {name}")

        # records are addressed through an index indirection so that label
        # filtering and FLEX subsetting never materialize a memmap-backed
        # store in RAM
        self._index = np.arange(len(self._store), dtype=np.int64)
        self._index_is_identity = True
        if self.label_filter is not None:
            keep = np.isin(self._labels_store, self.label_filter)
            self._index = self._index[keep]
            self._index_is_identity = bool(keep.all())

        self.trigger = self.target = self.mask = None
        self.clean_rate, self.poison_rate = 1.0, None
        self._is_clean: Optional[np.ndarray] = None
        self.backdoor = Backdoor(root=root or ".")

    @property
    def _images(self) -> np.ndarray:
        """Materialized image view (small in-RAM datasets / tests only): a
        read-only alias when the index is the identity, otherwise a COPY —
        writes to a non-identity view are discarded. Streaming access must go
        through ``_store[self._index[...]]``; a memmap-backed store with a
        subsetted index refuses to materialize multi-GB in one gather."""
        if self._index_is_identity:
            return self._store
        if self.is_memmap_backed:
            raise RuntimeError(
                "_images would materialize a subsetted memmap-backed store in "
                "RAM; stream batches via _store[self._index[...]] instead"
            )
        return self._store[self._index]

    @property
    def _labels(self) -> np.ndarray:
        return self._labels_store[self._index]

    @property
    def is_memmap_backed(self) -> bool:
        return isinstance(self._store, np.memmap)

    # -- poisoning --------------------------------------------------------------
    def set_poison(
        self,
        trigger_type: str,
        target_type: str,
        target_dx: int = -5,
        target_dy: int = -3,
        clean_rate: float = 1.0,
        poison_rate: float = 0.2,
    ) -> "DatasetLoader":
        self.clean_rate, self.poison_rate = clean_rate, poison_rate
        self.trigger = self.backdoor.get_trigger(
            trigger_type, channel=self.channel, image_size=self.image_size, vmin=self.vmin, vmax=self.vmax
        )
        self.target = self.backdoor.get_target(
            target_type, trigger=self.trigger, dx=target_dx, dy=target_dy, vmin=self.vmin, vmax=self.vmax
        )
        self.mask = trigger_mask(self.trigger, self.vmin)
        return self

    def prepare_dataset(self, mode: str = MODE_FIXED, split_method: str = "seeded") -> "DatasetLoader":
        """Assign the per-record clean/poison tags (the reference's concat of
        tagged splits, dataset.py:162-244).

        ``split_method``:
          * ``"seeded"`` (default) — one numpy permutation from ``self.seed``.
          * ``"hf"`` — membership from HF `datasets.Dataset.train_test_split`
            seeded with ``self.seed`` (bit-exact vs that library by
            construction). NOTE the reference passes NO seed to
            train_test_split (dataset.py:182,232), so its own membership is
            nondeterministic across runs — matching a particular reference
            run is impossible in principle; this option matches what the
            reference WOULD produce if seeded.
        """
        if self.poison_rate is None:
            # guard EVERY path (FLEX and the hf split consume the rates too)
            # before they hit float(None) with a raw TypeError
            raise ValueError("call set_poison before prepare_dataset")
        n = len(self._index)
        if split_method == "hf":
            perm = self._hf_split_permutation(n, mode)
        elif split_method == "seeded":
            rng = np.random.RandomState(self.seed)
            perm = rng.permutation(n)
        else:
            raise ValueError(f"unknown split_method {split_method!r}")
        if mode == self.MODE_FIXED:
            if not 0.0 <= float(self.poison_rate) <= 1.0:
                raise ValueError("In FIXED mode, poison rate should be within [0, 1]")
            if self.clean_rate != 1.0:
                Log.warning("In 'FIXED' mode of DatasetLoader, the clean_rate is ignored.")
            backdoor_n = int(n * float(self.poison_rate))
            is_clean = np.ones(n, bool)
            is_clean[perm[:backdoor_n]] = False
        elif mode == self.MODE_FLEX:
            clean_n = int(n * float(self.clean_rate))
            poison_n = int(n * float(self.poison_rate))
            if clean_n + poison_n > n:
                raise ValueError("FLEX mode needs clean_rate + poison_rate <= 1")
            keep = perm[: clean_n + poison_n]
            is_clean_kept = np.concatenate([np.ones(clean_n, bool), np.zeros(poison_n, bool)])
            self._index = self._index[keep]  # indirection only — no materialization
            self._index_is_identity = False  # keep is a permutation prefix, never identity-ordered
            is_clean = is_clean_kept
        else:
            raise NotImplementedError(f"Argument mode: {mode} isn't defined")
        self._is_clean = is_clean
        return self

    def _hf_split_permutation(self, n: int, mode: str) -> np.ndarray:
        """A permutation whose prefix ordering reproduces HF
        `train_test_split(seed=self.seed)` membership through the FIXED/FLEX
        tagging below (poison = the split's TEST side, reference
        dataset.py:182-184, 232-234)."""
        import datasets as hfds

        idx = hfds.Dataset.from_dict({"i": list(range(n))})
        if mode == self.MODE_FIXED:
            backdoor_n = int(n * float(self.poison_rate))
            if backdoor_n in (0, n):  # reference skips the split entirely (:174-180)
                return np.arange(n)
            dd = idx.train_test_split(test_size=backdoor_n, seed=self.seed)
            return np.concatenate([np.asarray(dd["test"]["i"]), np.asarray(dd["train"]["i"])])
        clean_n = int(n * float(self.clean_rate))
        poison_n = int(n * float(self.poison_rate))
        if clean_n + poison_n > n:
            raise ValueError("FLEX mode needs clean_rate + poison_rate <= 1")
        if clean_n == 0 or poison_n == 0:
            # HF train_test_split rejects a zero-sized side; with one side
            # empty there is no HF ordering to reproduce, so a single-split
            # (or trivial) permutation is the faithful fallback
            if clean_n == poison_n == 0:
                return np.arange(n)
            nonzero = clean_n or poison_n
            if nonzero == n:
                sel, rest = np.arange(n), np.empty(0, np.int64)
            else:
                dd = idx.train_test_split(test_size=nonzero, seed=self.seed)
                sel = np.asarray(dd["test"]["i"], np.int64)
                rest = np.asarray(dd["train"]["i"], np.int64)
            # FLEX tagging consumes perm[:clean_n] as clean then the next
            # poison_n as poisoned; with one side empty the selected members
            # lead in either case
            return np.concatenate([sel, rest])
        dd = idx.train_test_split(train_size=clean_n, test_size=poison_n, seed=self.seed)
        clean = np.asarray(dd["train"]["i"], np.int64)
        poison = np.asarray(dd["test"]["i"], np.int64)
        rest = np.setdiff1d(np.arange(n), np.concatenate([clean, poison]), assume_unique=False)
        # FLEX tagging below marks perm[:clean_n] clean, the next poison_n poisoned
        return np.concatenate([clean, poison, rest])

    # -- access -------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self._index)

    @property
    def num_batch(self) -> int:
        n = len(self)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def get_raw(self, idx) -> Dict[str, np.ndarray]:
        return {
            "image_u8": self._store[self._index[idx]],
            "is_clean": self._is_clean[idx],
            "label": self._labels_store[self._index[idx]],
        }

    def real_image_sample(self, n: int) -> np.ndarray:
        """uint8 [n,H,W,C]: the real-image set the reference's measure dump
        uses (baddiffusion.py:489: ``get_dataset().shuffle(seed)`` then the
        first n records). HF ``Dataset.shuffle(seed)`` draws its permutation
        from ``np.random.default_rng(seed)``, reproduced here directly so
        membership bit-matches a reference run with the same seed."""
        order = np.random.default_rng(self.seed).permutation(len(self))[:n]
        return self._store[self._index[order]]

    def get_sample(self, idx: int) -> Dict[str, np.ndarray]:
        """One materialized record with the reference schema (for
        visualization/debug; the train path stays uint8 until the device)."""
        from baddiffusion_tpu.data.poison import poison_batch_host

        rec = poison_batch_host(
            self._store[self._index[idx : idx + 1]],
            self._is_clean[idx : idx + 1],
            self.trigger,
            self.target,
            self.mask,
            self.vmin,
            self.vmax,
        )
        rec["label"] = self._labels_store[self._index[idx : idx + 1]]
        return {k: v[0] for k, v in rec.items()}

    def epoch_batches(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Deterministic per-epoch batch stream: seeded shuffle + per-sample
        hflip, uint8 payloads only."""
        if self._is_clean is None:
            raise RuntimeError("call prepare_dataset() first")
        n = len(self)
        rng = np.random.RandomState((self.seed * 1_000_003 + epoch) % (2**31))
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        bs = self.batch_size
        stop = n - (n % bs) if self.drop_last else n
        for start in range(0, stop, bs):
            idx = order[start : start + bs]
            # memmap-backed stores stream here: only this batch's pages are
            # read (gather copies them to a fresh RAM array)
            imgs = self._store[self._index[idx]]
            if self.hflip:
                flips = rng.rand(len(idx)) < 0.5
                imgs[flips] = imgs[flips, :, ::-1]
            yield {
                "image_u8": imgs,
                "is_clean": self._is_clean[idx],
                "label": self._labels_store[self._index[idx]],
            }

    def get_dataloader(self, epochs: Optional[int] = None) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite (or epochs-bounded) stream of batches."""
        e = 0
        while epochs is None or e < epochs:
            yield from self.epoch_batches(e)
            e += 1
