"""Streaming full-shot pipeline: samplers, StreamingSource, and the
trainer wired to TSV shards without materializing the dataset."""

import base64
import io

import numpy as np
import pytest

from peft_vit_tpu.data.samplers import (
    build_order,
    chunk_order,
    class_aware_order,
    default_order,
    shard_order,
)


class TestSamplers:
    def test_default_is_permutation(self):
        o = default_order(100, epoch=3, seed=1)
        assert sorted(o.tolist()) == list(range(100))
        assert not np.array_equal(o, default_order(100, epoch=4, seed=1))

    def test_class_aware_balances_classes(self):
        # 90/10 imbalance -> resampled epoch is ~uniform over classes
        labels = np.array([0] * 90 + [1] * 10)
        o = class_aware_order(labels, epoch=0, seed=0)
        assert len(o) == 100
        assert set(o.tolist()) <= set(range(100))
        counts = np.bincount(labels[o])
        assert abs(counts[0] - counts[1]) < 30  # vs 80 for default

    def test_chunk_order_covers_all_locally(self):
        o = chunk_order(100, epoch=0, seed=0, chunk_size=10)
        assert sorted(o.tolist()) == list(range(100))
        # each 10-run stays within one chunk
        for i in range(0, 100, 10):
            run = o[i : i + 10]
            assert run.max() - run.min() < 10

    def test_shard_order_disjoint_covering(self):
        o = default_order(64, 0, 0)
        shards = [shard_order(o, p, 4) for p in range(4)]
        merged = sorted(np.concatenate(shards).tolist())
        assert merged == list(range(64))

    def test_build_order_dispatch(self):
        assert len(build_order("default", 10, 0)) == 10
        assert len(build_order("chunk", 10, 0)) == 10
        with pytest.raises(ValueError):
            build_order("bogus", 10, 0)
        with pytest.raises(ValueError):
            build_order("class_aware", 10, 0)  # needs labels


# ---------------------------------------------------------------------------
# streaming source + trainer e2e (needs the native runtime)
# ---------------------------------------------------------------------------

from peft_vit_tpu.data.native import native_available

needs_native = pytest.mark.skipif(
    not native_available(), reason="libpvtio.so not buildable here"
)


def _png_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def tsv_shard(tmp_path_factory):
    pytest.importorskip("PIL")
    tmp = tmp_path_factory.mktemp("tsv")
    rows = []
    rng = np.random.RandomState(0)
    n, classes, size = 48, 4, 16
    for i in range(n):
        c = i % classes
        im = rng.randint(0, 40, (20, 20, 3)).astype(np.uint8)
        im[c * 5 : (c + 1) * 5] += 180  # class-dependent bright band
        rows.append(
            f"k{i}\t" + base64.b64encode(_png_bytes(im)).decode() + f"\t{c}"
        )
    p = tmp / "train.tsv"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def _cfg(tsv_path, batch=8):
    from peft_vit_tpu.config import get_default_config

    cfg = get_default_config()
    cfg.DATASET.DATASET = "tsvtest"
    cfg.DATASET.NUM_CLASSES = 4
    cfg.DATASET.ROOT = ""
    cfg.DATASET.TRAIN_TSV_LIST = [tsv_path]
    cfg.DATASET.TEST_TSV_LIST = [tsv_path]
    cfg.TRAIN.IMAGE_SIZE = [16, 16]
    cfg.TRAIN.BATCH_SIZE_PER_GPU = batch
    cfg.TEST.BATCH_SIZE_PER_GPU = batch
    cfg.TRAIN.END_EPOCH = 2
    cfg.TRAIN.LR = 0.05
    cfg.TRAIN.LR_SCHEDULER.METHOD = "constant"
    cfg.MODEL.NAME = "clip_tiny"
    cfg.MODEL.SPEC.EMBED_DIM = 32
    cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
    cfg.MODEL.SPEC.VISION.WIDTH = 32
    cfg.MODEL.SPEC.VISION.LAYERS = 2
    cfg.MODEL.SPEC.VISION.HEADS = 2
    cfg.PEFT.METHOD = "full"
    return cfg


@needs_native
class TestStreamingSource:
    def test_epoch_batches_normalized_and_sharded(self, tsv_shard):
        import jax

        from peft_vit_tpu.data.streaming import StreamingSource

        # per-process batch = BATCH_SIZE_PER_GPU * local_device_count
        src = StreamingSource(_cfg(tsv_shard, batch=1), "train")
        global_batch = jax.local_device_count()
        seen = 0
        for x, y in src.batches(0):
            assert x.shape == (global_batch, 16, 16, 3)
            assert x.dtype == np.float32
            assert abs(float(x.mean())) < 3.0  # normalized, not u8
            seen += len(y)
        full = (48 // global_batch) * global_batch
        assert seen == full  # drop_last
        assert src.steps_per_epoch == 48 // global_batch
        src.close()

    def test_eval_batches_keep_partial(self, tsv_shard):
        from peft_vit_tpu.data.streaming import StreamingSource

        cfg = _cfg(tsv_shard, batch=4)
        src = StreamingSource(cfg, "test")
        counts = [len(y) for _, y in src.batches()]
        assert sum(counts) == 48  # eval covers everything incl. partial
        assert all(c == counts[0] for c in counts[:-1])
        src.close()

    def test_device_prefetch_matches_host(self, tsv_shard):
        from peft_vit_tpu.data.streaming import StreamingSource

        cfg = _cfg(tsv_shard, batch=1)
        cfg.AUG.RANDOM_FLIP = False
        a = StreamingSource(cfg, "train")
        b = StreamingSource(cfg, "train")
        for (xa, ya), (xb, yb) in zip(
            a.batches(1), b.device_batches(1)
        ):
            np.testing.assert_array_equal(ya, np.asarray(yb))
            np.testing.assert_allclose(xa, np.asarray(xb), rtol=1e-6)
        a.close()
        b.close()

    def test_class_aware_sampler_runs(self, tsv_shard):
        cfg = _cfg(tsv_shard, batch=1)
        cfg.TRAIN.SAMPLER = "class_aware"
        from peft_vit_tpu.data.streaming import StreamingSource

        src = StreamingSource(cfg, "train")
        ys = np.concatenate([y for _, y in src.batches(0)])
        assert len(ys) == 48
        src.close()


@needs_native
class TestStreamingTrainer:
    def test_train_main_streams_tsv(self, tsv_shard, tmp_path):
        from peft_vit_tpu.commands.train import train_main

        cfg = _cfg(tsv_shard, batch=1)
        cfg.TRAIN.END_EPOCH = 4
        # isolated checkpoint dir: the default OUTPUT_DIR is shared across
        # tests and AUTO_RESUME would pick up another test's checkpoints
        cfg.OUTPUT_DIR = str(tmp_path)
        cfg.freeze()
        best = train_main(cfg)
        assert np.isfinite(best)
        assert best > 30.0  # learnable band: beats 25% chance


@needs_native
class TestChunkedStreaming:
    """batch_multiplier=K: loader emits K*B batches that reshape into
    tagged (K, B, ...) scan chunks (TPU.STEPS_PER_DISPATCH)."""

    def test_chunked_batches_shape_and_steps(self, tsv_shard):
        import jax

        from peft_vit_tpu.data.streaming import StreamingSource

        cfg = _cfg(tsv_shard, batch=1)
        src = StreamingSource(
            cfg, "train", normalize=False, batch_multiplier=2
        )
        b = jax.local_device_count()
        n_chunks = 0
        for item in src.batches(0):
            assert len(item) == 3 and item[2] is True
            xs, ys, _ = item
            assert xs.shape == (2, b, 16, 16, 3)
            assert xs.dtype == np.uint8
            assert ys.shape == (2, b)
            n_chunks += 1
        assert n_chunks == 48 // (2 * b)
        # steps_per_epoch counts optimizer steps, not dispatches
        assert src.steps_per_epoch == n_chunks * 2
        src.close()

    def test_chunk_tail_emitted_as_single_batches(self, tsv_shard):
        """drop_last works at B granularity, not K*B: the epoch remainder
        after the last full chunk yields complete single batches (an
        epoch must never silently lose up to K*B-1 samples)."""
        import jax

        from peft_vit_tpu.data.streaming import StreamingSource

        cfg = _cfg(tsv_shard, batch=1)
        b = jax.local_device_count()  # 8 -> K*B = 32, 48 % 32 = 16 tail
        src = StreamingSource(cfg, "train", batch_multiplier=4)
        chunks, singles, seen = 0, 0, 0
        for item in src.batches(0):
            if len(item) == 3:
                xs, ys, _ = item
                chunks += 1
                seen += xs.shape[0] * xs.shape[1]
            else:
                x, y = item
                assert x.shape[0] == b
                singles += 1
                seen += len(y)
        assert chunks == 48 // (4 * b)
        assert singles == (48 % (4 * b)) // b
        assert seen == (48 // b) * b
        assert src.steps_per_epoch == 48 // b
        src.close()

    def test_small_dataset_still_yields_batches(self, tsv_shard):
        """K*B larger than the dataset: the epoch still yields every
        complete batch instead of zero batches (advisor r2 medium)."""
        import jax

        from peft_vit_tpu.data.streaming import StreamingSource

        cfg = _cfg(tsv_shard, batch=2)
        b = 2 * jax.local_device_count()  # 16; K=8 -> K*B=128 > 48
        src = StreamingSource(cfg, "train", batch_multiplier=8)
        items = list(src.batches(0))
        n_batches = sum(
            1 if len(it) == 2 else it[0].shape[0] for it in items
        )
        assert n_batches == 48 // b > 0
        src.close()

    def test_prefetch_propagates_producer_errors(self):
        from peft_vit_tpu.data.streaming import host_prefetch

        def bad():
            yield 1
            raise RuntimeError("decode ring died")

        it = host_prefetch(bad(), depth=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="decode ring died"):
            list(it)

    def test_chunked_e2e_through_trainer(self, tsv_shard, tmp_path):
        from peft_vit_tpu.config import get_default_config
        from peft_vit_tpu.commands.train import train_main

        cfg = _cfg(tsv_shard, batch=4)
        # isolated: a stale checkpoint from a previous pytest run must
        # not be AUTO_RESUMEd into this one
        cfg.OUTPUT_DIR = str(tmp_path)
        cfg.TRAIN.END_EPOCH = 1
        cfg.TRAIN.EVAL_BEGIN_EPOCH = 0
        cfg.TPU.STEPS_PER_DISPATCH = 2
        cfg.NAME = "chunked"
        cfg.freeze()
        acc = train_main(cfg)
        assert np.isfinite(acc) and 0.0 <= acc <= 100.0


@needs_native
class TestImageFolderStreaming:
    """Native ImageFolder mode: one file per sample, decode in C threads
    (torchvision-ImageFolder layout streamed, never materialized)."""

    @pytest.fixture(scope="class")
    def image_tree(self, tmp_path_factory):
        pytest.importorskip("PIL")
        root = tmp_path_factory.mktemp("imgtree")
        rng = np.random.RandomState(0)
        train = root / "train"
        for c in range(3):
            d = train / f"class_{c}"
            d.mkdir(parents=True)
            for i in range(8):
                im = rng.randint(0, 40, (20, 20, 3)).astype(np.uint8)
                im[c * 6 : (c + 1) * 6] += 180
                (d / f"im{i}.png").write_bytes(_png_bytes(im))
        return str(root)

    def test_from_files_roundtrip(self, image_tree):
        from peft_vit_tpu.data.native import NativeTsvLoader
        from peft_vit_tpu.data.streaming import scan_imagefolder

        files, labels = scan_imagefolder(image_tree + "/train")
        assert len(files) == 24 and labels.max() == 2
        ld = NativeTsvLoader.from_files(
            files, labels, image_size=16, batch_size=6, shuffle=False
        )
        assert len(ld) == 24
        np.testing.assert_array_equal(ld.labels(), labels)
        got = 0
        for x, y, count in ld.epoch(0):
            assert x.shape == (6, 16, 16, 3)
            assert x[:count].mean() > 1.0  # actually decoded, not zeros
            got += count
        assert got == 24
        ld.close()

    def test_imagefolder_e2e_through_trainer(self, image_tree, tmp_path):
        from peft_vit_tpu.commands.train import train_main
        from peft_vit_tpu.config import get_default_config

        cfg = get_default_config()
        cfg.OUTPUT_DIR = str(tmp_path)
        cfg.DATASET.DATASET = "imgtree"
        cfg.DATASET.ROOT = image_tree
        cfg.DATASET.TRAIN_SET = "train"
        cfg.DATASET.TEST_SET = "train"  # reuse as eval split
        cfg.TRAIN.IMAGE_SIZE = [16, 16]
        cfg.TRAIN.BATCH_SIZE_PER_GPU = 1
        cfg.TEST.BATCH_SIZE_PER_GPU = 4
        cfg.TRAIN.END_EPOCH = 1
        cfg.TRAIN.EVAL_BEGIN_EPOCH = 0
        cfg.TRAIN.LR = 0.05
        cfg.TRAIN.LR_SCHEDULER.METHOD = "constant"
        cfg.MODEL.NAME = "clip_tiny"
        cfg.MODEL.SPEC.EMBED_DIM = 32
        cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
        cfg.MODEL.SPEC.VISION.WIDTH = 32
        cfg.MODEL.SPEC.VISION.LAYERS = 2
        cfg.MODEL.SPEC.VISION.HEADS = 2
        cfg.PEFT.METHOD = "full"
        cfg.NAME = "imgfolder"
        cfg.freeze()
        acc = train_main(cfg)
        assert np.isfinite(acc) and 0.0 <= acc <= 100.0


@needs_native
class TestZipStreaming:
    """Zip-archive mode: pread + inflate + decode in the C workers
    (ELEVATER / vision-datasets zip-packed image dumps)."""

    def test_from_zip_stored_and_deflated(self, tmp_path):
        import zipfile

        pytest.importorskip("PIL")
        rng = np.random.RandomState(0)
        zp = tmp_path / "images.zip"
        members, labels, originals = [], [], []
        with zipfile.ZipFile(zp, "w") as zf:
            for i in range(10):
                im = rng.randint(0, 255, (16, 16, 3)).astype(np.uint8)
                originals.append(im)
                name = f"img/{i:03d}.png"
                comp = (
                    zipfile.ZIP_DEFLATED if i % 2 else zipfile.ZIP_STORED
                )
                zf.writestr(
                    zipfile.ZipInfo(name), _png_bytes(im), comp
                )
                members.append(name)
                labels.append(i % 3)
        from peft_vit_tpu.data.native import NativeTsvLoader

        ld = NativeTsvLoader.from_zip(
            str(zp), members, labels, image_size=16, batch_size=4,
            shuffle=False,
        )
        assert len(ld) == 10
        np.testing.assert_array_equal(ld.labels(), labels)
        seen = []
        for x, y, count in ld.epoch(0):
            for j in range(count):
                seen.append((x[j], int(y[j])))
        assert len(seen) == 10
        # both stored and deflated entries decode to the exact pixels
        # (16x16 -> 16: resize is identity)
        for i, (x, y) in enumerate(seen):
            np.testing.assert_array_equal(x, originals[i])
            assert y == i % 3
        ld.close()
