"""Native IO runtime (runtime/pvtio.cpp) tests."""

import base64
import io
import os

import numpy as np
import pytest

from peft_vit_tpu.data.native import (
    NativeTsvLoader,
    decode_resize,
    native_available,
)

PIL = pytest.importorskip("PIL")
from PIL import Image

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libpvtio.so not buildable here"
)


def _jpeg_bytes(arr, quality=95):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _png_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class TestDecode:
    def test_jpeg_close_to_pil(self):
        img = np.full((64, 48, 3), 128, np.uint8)
        img[:32] = 30
        out = decode_resize(_jpeg_bytes(img), 32)
        assert out.shape == (32, 32, 3)
        # flat-region image: interpolation kernel differences are tiny
        from peft_vit_tpu.data.transforms import resize_center_crop

        ref = resize_center_crop(
            Image.open(io.BytesIO(_jpeg_bytes(img))), 32
        )
        assert np.abs(out.astype(int) - ref.astype(int)).mean() < 8

    def test_png_lossless(self):
        img = np.full((16, 16, 3), 77, np.uint8)
        out = decode_resize(_png_bytes(img), 16)
        np.testing.assert_array_equal(out, img)

    def test_garbage_returns_none(self):
        assert decode_resize(b"not an image at all", 16) is None


class TestLoader:
    @pytest.fixture()
    def shard(self, tmp_path):
        rows = []
        for i in range(9):
            im = np.full((20, 20, 3), i * 25, np.uint8)
            rows.append(
                f"k{i}\t"
                + base64.b64encode(_png_bytes(im)).decode()
                + f"\t{i % 4}"
            )
        p = tmp_path / "s.tsv"
        p.write_text("\n".join(rows) + "\n")
        return str(p)

    def test_epoch_covers_all(self, shard):
        ld = NativeTsvLoader(
            [shard], image_size=16, batch_size=4, shuffle=False,
            num_threads=2,
        )
        assert len(ld) == 9
        got = []
        for x, y, c in ld.epoch(0):
            got.extend(y[:c].tolist())
            # pixel value encodes the sample id; label = id % 4
            ids = (x[:c, 0, 0, 0].astype(int) + 12) // 25
            np.testing.assert_array_equal(ids % 4, y[:c])
        assert sorted(got) == sorted([i % 4 for i in range(9)])
        ld.close()

    def test_multithread_order_matches_shuffle_order(self, shard):
        # batches must arrive in batch-index order regardless of thread
        # count (slot = b % ring), with the partial batch last
        def ids_seq(threads):
            ld = NativeTsvLoader(
                [shard], image_size=16, batch_size=2, shuffle=True,
                seed=7, num_threads=threads,
            )
            seq = [
                ((x[:c, 0, 0, 0].astype(int) + 12) // 25).tolist()
                for x, y, c in ld.epoch(0)
            ]
            ld.close()
            return seq

        one, four = ids_seq(1), ids_seq(4)
        assert one == four
        assert len(four[-1]) == 1  # 9 % 2 == 1: partial batch delivered last

    def test_shuffle_differs_by_epoch(self, shard):
        ld = NativeTsvLoader(
            [shard], image_size=16, batch_size=9, shuffle=True, seed=3,
            num_threads=1,
        )
        (x0, y0, _), = list(ld.epoch(0))
        (x1, y1, _), = list(ld.epoch(1))
        assert not np.array_equal(y0, y1) or not np.array_equal(x0, x1)
        ld.close()
