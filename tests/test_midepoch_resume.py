"""Preemption-tolerant mid-epoch resume (TRAIN.CHECKPOINT_EVERY_STEPS).

The reference resumes at epoch granularity only (lib/utils/utils.py:
101-203); this framework additionally checkpoints every N optimizer
steps and resumes a preempted epoch at the exact batch, with the host
RNG stream and data/flip order continuing as if never interrupted —
the TPU-pod preemption story.
"""

import base64
import io
import itertools

import jax
import numpy as np
import pytest

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.data import synthetic_dataset
from peft_vit_tpu.data.native import native_available
from peft_vit_tpu.engine.trainer import (
    Trainer,
    _skip_batches,
    batch_iterator,
)
from peft_vit_tpu.models import ImageClassifier, VisionTransformer
from peft_vit_tpu.peft import PEFTSpec, build_mask

needs_native = pytest.mark.skipif(
    not native_available(), reason="libpvtio.so not buildable here"
)


def make_cfg(**over):
    cfg = get_default_config()
    cfg.DATASET.DATASET = "synthetic"
    cfg.DATASET.NUM_CLASSES = 4
    cfg.MODEL.NUM_CLASSES = 4
    cfg.TRAIN.IMAGE_SIZE = [16, 16]
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 8
    cfg.TRAIN.END_EPOCH = 1
    cfg.TRAIN.LR = 0.05
    cfg.TRAIN.LR_SCHEDULER.METHOD = "constant"
    for k, v in over.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def make_trainer(cfg):
    vit = VisionTransformer(
        image_size=16,
        patch_size=8,
        width=32,
        layers=2,
        heads=2,
        style="timm",
        spec=PEFTSpec(),
        use_flash=False,
    )
    model = ImageClassifier(backbone=vit, num_classes=4)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 16, 16, 3), np.float32)
    )["params"]
    mask = build_mask(params, "bitfit", num_layers=2)
    return Trainer(cfg, model, params, mask, steps_per_epoch=8)


def _data():
    x, y = synthetic_dataset(16, 16, 16)  # 64 samples = 8 batches of 8
    return x.astype(np.float32) / 255.0, y


def _leaves(t):
    return jax.tree_util.tree_leaves(t.state.trainable)


class TestSkipBatches:
    def test_raw_and_chunked_units(self):
        raw = [(np.zeros((8, 1)), np.zeros(8))] * 6
        assert len(list(_skip_batches(iter(raw), 4))) == 2
        chunks = [(np.zeros((2, 8, 1)), np.zeros((2, 8)), True)] * 3
        assert len(list(_skip_batches(iter(chunks), 4))) == 1
        assert list(_skip_batches(iter(raw), 99)) == []


class TestMidEpochResume:
    @pytest.mark.parametrize("k_disp", [1, 2])
    def test_resumed_equals_uninterrupted(self, k_disp, tmp_path):
        cfg = make_cfg(
            **{
                "TRAIN.CHECKPOINT_EVERY_STEPS": 4,
                "TPU.STEPS_PER_DISPATCH": k_disp,
            }
        )
        x, y = _data()
        d = str(tmp_path / "ckpt")

        # A: uninterrupted epoch of 8 batches
        ref = make_trainer(cfg)
        ref.train_one_epoch(batch_iterator(x, y, 8, seed=0), epoch=0)

        # B: "preempted" after 4 batches — only the prefix is ever fed;
        # the step-4 checkpoint is the survivor
        pre = make_trainer(cfg)
        pre.train_one_epoch(
            itertools.islice(batch_iterator(x, y, 8, seed=0), 4),
            epoch=0,
            checkpoint_dir=d,
        )

        # C: fresh process resumes at the exact batch with the saved RNG
        res = make_trainer(cfg)
        assert res.maybe_resume(d) == 0
        assert res.resume_batch_in_epoch == 4
        res.train_one_epoch(
            _skip_batches(batch_iterator(x, y, 8, seed=0), 4),
            epoch=0,
            start_batch=4,
        )
        for a, b in zip(_leaves(ref), _leaves(res)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fit_resumes_midepoch_end_to_end(self, tmp_path):
        cfg = make_cfg(**{"TRAIN.CHECKPOINT_EVERY_STEPS": 2})
        x, y = _data()
        d = str(tmp_path / "ckpt")

        def full_epoch(e, skip=None):
            it = batch_iterator(x, y, 8, seed=e)
            return it if skip is None else _skip_batches(it, skip)

        def eval_batches():
            return batch_iterator(x, y, 8, shuffle=False, drop_last=False)

        ref = make_trainer(cfg)
        ref.fit(lambda e: full_epoch(e), eval_batches)

        # run 1 crashes after 4 of 8 batches (mid-epoch ckpts at 2 and 4
        # already on disk; fit never reaches its end-of-epoch save)
        class Crash(Exception):
            pass

        def crashing(e):
            for j, b in enumerate(batch_iterator(x, y, 8, seed=e)):
                if j == 4:
                    raise Crash()
                yield b

        pre = make_trainer(cfg)
        with pytest.raises(Crash):
            pre.fit(crashing, eval_batches, checkpoint_dir=d)

        # run 2 auto-resumes epoch 0 at batch 4 through fit's seekable-
        # source protocol (fn(epoch, start_batch))
        res = make_trainer(cfg)
        res.fit(full_epoch, eval_batches, checkpoint_dir=d)
        for a, b in zip(_leaves(ref), _leaves(res)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestMeshResume:
    @pytest.mark.parametrize("zero1", [False, True])
    def test_midepoch_resume_on_mesh(self, zero1, tmp_path):
        """Orbax restores single-process arrays committed to device 0;
        maybe_resume must re-place them (replicated, or the ZeRO-1
        shardings for the optimizer tree) or the next sharded step
        fails with mixed committed placements."""
        if jax.device_count() < 8:
            pytest.skip("needs the 8-device virtual mesh")
        from peft_vit_tpu.parallel import make_mesh

        mesh = make_mesh(data=8, model=1)
        x, y = _data()
        d = str(tmp_path / "ckpt")

        def trainer():
            cfg = make_cfg(
                **{
                    "TRAIN.CHECKPOINT_EVERY_STEPS": 4,
                    "TPU.ZERO1": zero1,
                }
            )
            vit = VisionTransformer(
                image_size=16, patch_size=8, width=32, layers=2,
                heads=2, style="timm", spec=PEFTSpec(), use_flash=False,
            )
            model = ImageClassifier(backbone=vit, num_classes=4)
            params = model.init(
                jax.random.PRNGKey(0), np.zeros((1, 16, 16, 3), np.float32)
            )["params"]
            mask = build_mask(params, "bitfit", num_layers=2)
            return Trainer(
                cfg, model, params, mask, steps_per_epoch=8, mesh=mesh
            )

        ref = trainer()
        ref.train_one_epoch(batch_iterator(x, y, 8, seed=0), epoch=0)

        pre = trainer()
        pre.train_one_epoch(
            itertools.islice(batch_iterator(x, y, 8, seed=0), 4),
            epoch=0,
            checkpoint_dir=d,
        )

        res = trainer()
        assert res.maybe_resume(d) == 0
        assert res.resume_batch_in_epoch == 4
        res.train_one_epoch(
            _skip_batches(batch_iterator(x, y, 8, seed=0), 4),
            epoch=0,
            start_batch=4,
        )
        # zero1: the restored, explicitly re-sharded state compiles a
        # fresh executable whose collective reduction order may differ
        # by 1 ulp per step from the original's — allow float noise;
        # the replicated path is bit-exact
        atol = 1e-6 if zero1 else 0.0
        for a, b in zip(_leaves(ref), _leaves(res)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=atol
            )


class TestBackCompat:
    def test_resume_checkpoint_without_new_keys(self, tmp_path):
        """Checkpoints from before the rng/batch_in_epoch fields existed
        must still resume (checkpoint_keys filters the template by what's
        actually on disk)."""
        from peft_vit_tpu.engine.checkpoint import (
            checkpoint_keys,
            save_checkpoint,
        )

        cfg = make_cfg()
        tr = make_trainer(cfg)
        x, y = _data()
        tr.train_one_epoch(batch_iterator(x, y, 8, seed=0), epoch=0)
        d = str(tmp_path / "old")
        state = tr._ckpt_state(epoch=0)
        del state["rng"], state["batch_in_epoch"]  # pre-feature layout
        save_checkpoint(d, 0, state)
        stored = checkpoint_keys(d)
        assert stored is not None and "rng" not in stored

        tr2 = make_trainer(cfg)
        assert tr2.maybe_resume(d) == 0
        assert tr2.resume_batch_in_epoch == 0
        for a, b in zip(_leaves(tr), _leaves(tr2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSigtermPreemption:
    def test_sigterm_checkpoints_and_resume_matches(self, tmp_path):
        import os
        import signal

        from peft_vit_tpu.engine.trainer import PreemptedError

        cfg = make_cfg(**{"TRAIN.CHECKPOINT_EVERY_STEPS": 100})
        x, y = _data()
        d = str(tmp_path / "ckpt")

        ref = make_trainer(cfg)
        ref.fit(
            lambda e: batch_iterator(x, y, 8, seed=e),
            lambda: batch_iterator(x, y, 8, shuffle=False, drop_last=False),
        )

        def preempting_batches(e, skip=None):
            it = batch_iterator(x, y, 8, seed=e)
            if skip:
                yield from _skip_batches(it, skip)
                return
            for j, b in enumerate(it):
                if j == 3:  # preemption notice mid-epoch
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b

        pre = make_trainer(cfg)
        prior = signal.getsignal(signal.SIGTERM)
        with pytest.raises(PreemptedError, match="checkpointed"):
            pre.fit(
                preempting_batches,
                lambda: iter(()),
                checkpoint_dir=d,
            )
        # fit restored the previous SIGTERM disposition on the way out
        assert signal.getsignal(signal.SIGTERM) is prior

        res = make_trainer(cfg)
        res.fit(
            preempting_batches,
            lambda: batch_iterator(x, y, 8, shuffle=False, drop_last=False),
            checkpoint_dir=d,
        )
        for a, b in zip(_leaves(ref), _leaves(res)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCliPreemptExit:
    def test_main_exits_75_on_preemption(self, monkeypatch, tmp_path):
        """EX_TEMPFAIL tells the scheduler a preempted run is a retry."""
        from peft_vit_tpu.commands import train as train_cmd
        from peft_vit_tpu.engine.trainer import PreemptedError

        monkeypatch.setattr(
            train_cmd,
            "train_main",
            lambda cfg: (_ for _ in ()).throw(PreemptedError("boom")),
        )
        with pytest.raises(SystemExit) as e:
            train_cmd.main(["OUTPUT_DIR", str(tmp_path)])
        assert e.value.code == 75


@needs_native
class TestStreamingSkip:
    def test_skip_matches_uninterrupted_suffix(self, tmp_path):
        from PIL import Image

        from peft_vit_tpu.data.streaming import StreamingSource

        rows = []
        rng = np.random.RandomState(0)
        for i in range(40):
            im = rng.randint(0, 255, (20, 20, 3)).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(im).save(buf, format="PNG")
            rows.append(
                f"k{i}\t"
                + base64.b64encode(buf.getvalue()).decode()
                + f"\t{i % 4}"
            )
        p = tmp_path / "train.tsv"
        p.write_text("\n".join(rows) + "\n")

        # batch = 1 x local_device_count (8 on the virtual CPU mesh);
        # 40 samples / chunk=2 -> two full (2, 8, ...) chunks + an
        # 8-sample tail batch
        cfg = make_cfg(**{"TRAIN.BATCH_SIZE_PER_GPU": 1})
        cfg.DATASET.ROOT = ""
        cfg.DATASET.TRAIN_TSV_LIST = [str(p)]
        cfg.DATASET.TEST_TSV_LIST = [str(p)]

        full = list(
            StreamingSource(cfg, "train", batch_multiplier=2).batches(
                epoch=3
            )
        )
        assert len(full) == 3 and full[0][0].shape[0] == 2
        # skip 1 chunk = 2 raw batches; decode-free seek must reproduce
        # the uninterrupted epoch's suffix bit-for-bit (incl. flip masks)
        rest = list(
            StreamingSource(cfg, "train", batch_multiplier=2).batches(
                epoch=3, skip_batches=2
            )
        )
        assert len(rest) == len(full) - 1
        for got, want in zip(rest, full[1:]):
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1])

    def test_misaligned_skip_is_exact(self, tmp_path):
        """A chunk-misaligned resume point (e.g. a checkpoint taken on a
        ragged tail batch) re-decodes one emission and must still yield
        the uninterrupted epoch's exact remaining raw batches."""
        from PIL import Image

        from peft_vit_tpu.data.streaming import StreamingSource

        rows = []
        rng = np.random.RandomState(1)
        for i in range(40):
            im = rng.randint(0, 255, (20, 20, 3)).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(im).save(buf, format="PNG")
            rows.append(
                f"k{i}\t"
                + base64.b64encode(buf.getvalue()).decode()
                + f"\t{i % 4}"
            )
        p = tmp_path / "t.tsv"
        p.write_text("\n".join(rows) + "\n")
        cfg = make_cfg(**{"TRAIN.BATCH_SIZE_PER_GPU": 1})
        cfg.DATASET.ROOT = ""
        cfg.DATASET.TRAIN_TSV_LIST = [str(p)]
        cfg.DATASET.TEST_TSV_LIST = [str(p)]

        def flat(items):
            # expand chunk items into raw (B, ...) batches
            out = []
            for it in items:
                if len(it) == 3:
                    out.extend(zip(it[0], it[1]))
                else:
                    out.append((it[0], it[1]))
            return out

        full = flat(
            StreamingSource(cfg, "train", batch_multiplier=2).batches(
                epoch=5
            )
        )
        rest = flat(
            StreamingSource(cfg, "train", batch_multiplier=2).batches(
                epoch=5, skip_batches=3
            )
        )
        assert len(rest) == len(full) - 3
        for (gx, gy), (wx, wy) in zip(rest, full[3:]):
            np.testing.assert_array_equal(gx, wx)
            np.testing.assert_array_equal(gy, wy)
