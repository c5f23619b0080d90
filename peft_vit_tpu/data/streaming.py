"""Streaming full-shot input pipeline.

The reference trains ImageNet-scale data through torch DataLoader worker
processes over TSV shards (full_shot/main/tools/train.py:26,154-155;
TSV keys at lib/config/default.py:69-73).  The TPU-native equivalent:

* decode + prefetch runs in the C++ runtime's threads
  (``runtime/pvtio.cpp`` via ``NativeTsvLoader``) — bounded ring buffer,
  so host RSS stays O(ring), never O(dataset)
* the sampler (``TRAIN.SAMPLER``: default / class_aware / chunk) is a
  host numpy order over sample indices (``data/samplers.py``)
* ``prefetch_to_device`` keeps the next batches' host->HBM transfer in
  flight while the device runs the current step
* multi-host: every process derives the same global order, then takes
  its ``process_index``-th shard
"""

from __future__ import annotations

import logging
import os
import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from .native import NativeTsvLoader, native_available
from .samplers import build_order, shard_order

logger = logging.getLogger(__name__)


class _Raise:
    """Exception captured on a producer thread, re-raised at the consumer
    (a silently-truncated epoch must not look like a normal epoch end)."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def _threaded_pipe(batches: Iterator, transform, depth: int):
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def producer():
        try:
            for item in batches:
                q.put(transform(item))
        except BaseException as e:  # noqa: BLE001 — forwarded, not swallowed
            q.put(_Raise(e))
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, _Raise):
            raise item.exc
        yield item


def prefetch_to_device(
    batches: Iterator[Tuple[np.ndarray, np.ndarray]], depth: int = 2
):
    """Move (x, y) to device ``depth`` batches ahead of consumption on a
    background thread, overlapping PCIe/ICI transfer with compute.
    Producer-side errors are re-raised at the consumer."""
    import jax

    return _threaded_pipe(
        batches,
        lambda xy: tuple(jax.device_put(a) for a in xy),
        depth,
    )


def host_prefetch(batches: Iterator, depth: int = 8):
    """Buffer host batches on a background thread (keeps the native
    decode ring draining while the consumer blocks on device transfer —
    the companion of TPU.STEPS_PER_DISPATCH chunking, where the trainer
    owns the single big host->device transfer per chunk).  Producer-side
    errors are re-raised at the consumer rather than ending the epoch."""
    return _threaded_pipe(batches, lambda item: item, depth)


_IMAGE_EXTS = (
    ".jpg", ".jpeg", ".png", ".bmp", ".ppm", ".webp", ".jfif",
)


def scan_imagefolder(folder: str):
    """Class-per-subdirectory tree -> (file_paths, labels); classes sorted
    by name (same index assignment as registry.load_imagefolder).  Only
    image extensions are picked up (torchvision ImageFolder convention) —
    stray metadata files would otherwise decode to black images."""
    classes = sorted(
        d
        for d in os.listdir(folder)
        if os.path.isdir(os.path.join(folder, d))
    )
    paths, labels = [], []
    for ci, c in enumerate(classes):
        cdir = os.path.join(folder, c)
        for f in sorted(os.listdir(cdir)):
            if not f.lower().endswith(_IMAGE_EXTS):
                continue
            paths.append(os.path.join(cdir, f))
            labels.append(ci)
    return paths, np.asarray(labels, np.int64)


class StreamingSource:
    """Config -> per-epoch batch iterators over TSV shards or an
    ImageFolder tree (native decode threads either way)."""

    def __init__(
        self,
        cfg,
        split: str = "train",
        normalize: bool = True,
        batch_multiplier: int = 1,
    ):
        import jax

        # normalize=False ships raw uint8 (device-side timm-aug path:
        # the jitted step augments + normalizes; 4x less host->HBM bytes)
        self.normalize = normalize
        # batch_multiplier=K (TPU.STEPS_PER_DISPATCH): the loader emits
        # K*B-sample batches which reshape (zero-copy) to (K, B, ...)
        # scan chunks — no host-side stacking
        self.chunk = max(int(batch_multiplier), 1)

        if not native_available():
            raise RuntimeError(
                "streaming path needs the native runtime (libpvtio.so)"
            )
        tsv_list = (
            cfg.DATASET.TRAIN_TSV_LIST
            if split == "train"
            else cfg.DATASET.TEST_TSV_LIST
        )
        root = cfg.DATASET.ROOT
        self.split = split
        self.train = split == "train"
        self.batch = int(
            cfg.TRAIN.BATCH_SIZE_PER_GPU
            if self.train
            else cfg.TEST.BATCH_SIZE_PER_GPU
        ) * jax.local_device_count()
        split_dir = (
            cfg.DATASET.TRAIN_SET
            if self.train
            else (cfg.DATASET.TEST_SET or cfg.DATASET.VAL_SET)
        )
        # empty split dir would resolve to ROOT itself, whose
        # subdirectories are splits, not classes — never scan that
        folder = os.path.join(root, split_dir) if split_dir else ""
        if tsv_list:
            paths = [
                os.path.join(root, p) if root else p for p in tsv_list
            ]
            self.loader = NativeTsvLoader(
                paths,
                image_size=int(cfg.TRAIN.IMAGE_SIZE[0]),
                batch_size=self.batch * self.chunk,
                shuffle=self.train and bool(cfg.TRAIN.SHUFFLE),
                seed=int(cfg.DATASET.RANDOM_SEED_SAMPLING),
                num_threads=int(cfg.WORKERS or 4),
            )
        elif os.path.isdir(folder):
            # ImageFolder tree: metadata walk on the host, decode in the
            # native worker threads (the dataset is never materialized)
            files, labels = scan_imagefolder(folder)
            # _labels_fn reads labels back from the loader (it may have
            # skipped unreadable files, so the C side is authoritative)
            self.loader = NativeTsvLoader.from_files(
                files,
                labels,
                image_size=int(cfg.TRAIN.IMAGE_SIZE[0]),
                batch_size=self.batch * self.chunk,
                shuffle=self.train and bool(cfg.TRAIN.SHUFFLE),
                seed=int(cfg.DATASET.RANDOM_SEED_SAMPLING),
                num_threads=int(cfg.WORKERS or 4),
            )
        else:
            # ELEVATER / vision-datasets manifest with zip-packed images
            from .elevater import scan_zip_split

            hit = scan_zip_split(cfg, "train" if self.train else "test")
            if hit is None:
                raise ValueError(
                    f"no TSV list, ImageFolder dir ({folder!r}), or "
                    f"streamable zip manifest for split {split!r}"
                )
            zip_path, members, labels = hit
            self.loader = NativeTsvLoader.from_zip(
                zip_path,
                members,
                labels,
                image_size=int(cfg.TRAIN.IMAGE_SIZE[0]),
                batch_size=self.batch * self.chunk,
                shuffle=self.train and bool(cfg.TRAIN.SHUFFLE),
                seed=int(cfg.DATASET.RANDOM_SEED_SAMPLING),
                num_threads=int(cfg.WORKERS or 4),
            )
        self.sampler = str(cfg.TRAIN.SAMPLER)
        self.seed = int(cfg.DATASET.RANDOM_SEED_SAMPLING)
        self.flip = self.train and bool(cfg.AUG.get("RANDOM_FLIP", True))
        self.mean = np.asarray(cfg.INPUT.MEAN, np.float32) * 255.0
        self.std = np.asarray(cfg.INPUT.STD, np.float32) * 255.0
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self._labels: Optional[np.ndarray] = None
        n_global = len(self.loader)
        self.n_global = n_global
        # eval is ALSO process-sharded: each host decodes + scores only
        # its stripe, and the trainer reduces across processes (the
        # reference all-reduces per-rank meters, lib/core/function.py:
        # 271-279) — without this every host would evaluate the full set
        self.samples_this_process = len(
            shard_order(
                np.arange(n_global), self.process_index, self.process_count
            )
        )
        if self.train and self.process_count > 1:
            # every jitted train step is a global collective (the batch is
            # assembled with make_array_from_process_local_data), so ALL
            # processes must emit IDENTICAL batch counts.  shard_order
            # stripes differ by up to 1 sample; truncate every process to
            # the minimum stripe so batch sequences stay in lockstep — the
            # analog of DistributedSampler's drop-to-equal behavior.
            self.samples_this_process = n_global // self.process_count
        # drop_last operates at B granularity: full K*B chunks are scanned,
        # and the epoch tail (< K full batches) is emitted as single
        # batches — a small dataset must not silently yield zero batches
        # just because K*B exceeds it (the reference's DataLoader drops at
        # most B-1 samples; so do we).
        self.steps_per_epoch = max(
            self.samples_this_process // self.batch, 1
        )
        if self.train and self.samples_this_process < self.batch:
            logger.warning(
                "=> streaming %s: only %d samples for batch size %d — "
                "every epoch will yield ZERO batches (drop_last)",
                split,
                self.samples_this_process,
                self.batch,
            )
        logger.info(
            "=> streaming %s: %d samples (%d this process), batch %d, "
            "sampler %s",
            split,
            n_global,
            self.samples_this_process,
            self.batch,
            self.sampler,
        )

    def _labels_fn(self) -> np.ndarray:
        if self._labels is None:
            self._labels = self.loader.labels()
        return self._labels

    def _normalize(self, x_u8: np.ndarray) -> np.ndarray:
        if not self.normalize:
            return x_u8
        return (x_u8.astype(np.float32) - self.mean) / self.std

    def batches(self, epoch: int = 0, skip_batches: int = 0):
        """One epoch of normalized (x, y) host batches.

        Train: sampler-ordered, per-process shard, drop_last, random
        horizontal flip.  Eval: sequential, partial final batch kept.

        ``skip_batches`` resumes a preempted epoch mid-stream WITHOUT
        decoding the already-trained prefix: the per-epoch order is
        deterministic, so the skipped samples are trimmed from the order
        (the flip RNG is burned in lockstep so the remainder sees the
        exact flips of an uninterrupted epoch).  A chunk-misaligned skip
        re-decodes at most one K*B emission and drops its leading
        batches after flipping — still bit-exact."""
        if self.train:
            order = build_order(
                self.sampler,
                len(self.loader),
                epoch,
                self.seed,
                labels_fn=self._labels_fn,
            )
            order = shard_order(
                order, self.process_index, self.process_count
            )
            if self.process_count > 1:
                # lockstep with other processes: equal-length orders give
                # identical chunk/tail sequences (samples_this_process is
                # the min stripe, computed once in __init__)
                order = order[: self.samples_this_process]
            rng = np.random.RandomState(self.seed + 7919 * (epoch + 1))
            big = self.batch * self.chunk
            lead = 0  # batches to drop from the first decoded emission
            if skip_batches:
                skip = int(skip_batches) * self.batch
                n_em, rem = divmod(skip, big)
                # whole emissions are trimmed from the order (never
                # decoded); a chunk-misaligned remainder re-decodes ONE
                # emission and drops its leading batches after flipping,
                # so the surviving batches still see the uninterrupted
                # epoch's exact flip masks
                order = order[n_em * big :]
                lead = rem // self.batch
                if self.flip and self.normalize:
                    for _ in range(n_em):
                        rng.rand(big)  # keep flip masks epoch-identical
            for x, y, count in self.loader.epoch(epoch, order=order):
                tail = count < big
                n_full = count // self.batch  # full batches in the tail
                if tail and n_full == 0:
                    break  # drop_last at B granularity
                x = self._normalize(x)
                # raw-u8 mode leaves flips to the device-side transform
                if self.flip and self.normalize:
                    sel = rng.rand(len(x)) < 0.5
                    x[sel] = x[sel, :, ::-1]
                if tail:
                    # epoch remainder: emit complete single batches so
                    # small datasets (< K*B samples) still train
                    for j in range(lead, n_full):
                        s = slice(j * self.batch, (j + 1) * self.batch)
                        yield x[s], y[s]
                    break
                if lead:
                    # partially-skipped first emission of a misaligned
                    # resume: its surviving batches go out unstacked
                    for j in range(lead, self.chunk):
                        s = slice(j * self.batch, (j + 1) * self.batch)
                        yield x[s], y[s]
                    lead = 0
                    continue
                if self.chunk > 1:
                    # (K*B, ...) -> (K, B, ...) is a view — no copy
                    yield (
                        x.reshape(self.chunk, self.batch, *x.shape[1:]),
                        y.reshape(self.chunk, self.batch),
                        True,
                    )
                else:
                    yield x, y
        else:
            order = shard_order(
                np.arange(self.n_global, dtype=np.int64),
                self.process_index,
                self.process_count,
            )
            for x, y, count in self.loader.epoch(0, order=order):
                yield self._normalize(x[:count]), y[:count]

    def device_batches(self, epoch: int = 0, depth: int = 2):
        return prefetch_to_device(self.batches(epoch), depth=depth)

    def close(self):
        self.loader.close()
