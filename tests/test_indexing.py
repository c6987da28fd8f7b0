"""Indexing/slicing vs NumPy (reference test_ops.py:205-361;
reference semantics: dsc.cpp:829-1169)."""

import math
import random

import numpy as np

import dsc_tpu as dsc

from conftest import DSC_DTYPES, DTYPES, all_close, random_nd


def _as_np(res):
    """dsc get results: Tensor -> ndarray; 1-element results arrive as
    Python scalars (reference unwrap, python/dsc/tensor.py:91-103)."""
    return res.numpy() if isinstance(res, dsc.Tensor) else np.atleast_1d(res)


def _validate_slice(sl: slice, max_dim: int) -> bool:
    san_start = sl.start if sl.start >= 0 else sl.start + max_dim
    san_stop = sl.stop if sl.stop >= 0 else sl.stop + max_dim
    if sl.step == 0 or san_start == san_stop:
        return False
    if (sl.step > 0 and san_stop < san_start) or (
        sl.step < 0 and san_stop > san_start
    ):
        return False
    return True


class TestIndexing:
    def test_get_idx(self):
        for n_dim in range(4):
            for dtype in DTYPES:
                x = random_nd([10] * (n_dim + 1), dtype=dtype)
                x_dsc = dsc.from_numpy(x)
                for indexes in range(n_dim + 1):
                    for _ in range(10):
                        idx = tuple(
                            random.randint(-10, 9) for _ in range(indexes + 1)
                        )
                        res = x[idx]
                        res_dsc = x_dsc[idx]
                        if isinstance(res_dsc, dsc.Tensor):
                            assert all_close(res_dsc.numpy(), res)
                        else:
                            assert np.isclose(res, res_dsc)

    def test_get_slice(self):
        x_1d = random_nd([10], np.float32)
        x_1d_dsc = dsc.from_numpy(x_1d)

        for start in range(-10, 10):
            for stop in range(-10, 10):
                for step in (-7, -3, -2, -1, 1, 2, 3, 7):
                    s = slice(start, stop, step)
                    if not _validate_slice(s, 10):
                        continue
                    assert all_close(_as_np(x_1d_dsc[s]), x_1d[s])

        # open-ended slices
        assert all_close(x_1d_dsc[:].numpy(), x_1d[:])
        assert all_close(x_1d_dsc[::-1].numpy(), x_1d[::-1])
        assert all_close(x_1d_dsc[3:].numpy(), x_1d[3:])
        assert all_close(x_1d_dsc[:-2].numpy(), x_1d[:-2])
        assert all_close(x_1d_dsc[::2].numpy(), x_1d[::2])

        x_2d = random_nd([5, 5], np.float32)
        x_2d_dsc = dsc.from_numpy(x_2d)

        for start in range(-5, 5):
            for stop in range(-5, 5):
                for step in (-3, -1, 1, 2):
                    s = slice(start, stop, step)
                    if not _validate_slice(s, 5):
                        continue
                    key = (slice(None), s)
                    assert all_close(_as_np(x_2d_dsc[key]), x_2d[key])

        # mixed int + slice collapses the int dim (reference dsc.cpp:898-948)
        for extra_dim in range(-5, 5):
            for start in range(-5, 5):
                for stop in range(-5, 5):
                    for step in (-2, -1, 1, 3):
                        s = slice(start, stop, step)
                        if not _validate_slice(s, 5):
                            continue
                        assert all_close(
                            _as_np(x_2d_dsc[(extra_dim, s)]), x_2d[(extra_dim, s)]
                        )
                        assert all_close(
                            _as_np(x_2d_dsc[(s, extra_dim)]), x_2d[(s, extra_dim)]
                        )

    def test_one_element_unwrap(self):
        # x[3:4] is a Python scalar, not a Tensor (reference
        # python/dsc/tensor.py:91-103); 0-d results too
        x = dsc.from_numpy(np.arange(10, dtype=np.float32))
        assert isinstance(x[3], float) and x[3] == 3.0
        assert isinstance(x[3:4], float) and x[3:4] == 3.0
        c = dsc.from_numpy((np.arange(4) + 1j).astype(np.complex64))
        assert isinstance(c[1:2], complex) and c[1:2] == 1 + 1j
        m = dsc.from_numpy(np.arange(4, dtype=np.float32).reshape(2, 2))
        assert isinstance(m[1:2, 0:1], float) and m[1:2, 0:1] == 2.0

    def test_set_idx(self):
        for n_dim in range(1, 5):
            for dtype in DTYPES:
                x = random_nd([10] * n_dim, dtype=dtype)
                x_dsc = dsc.from_numpy(x)
                for indexes in range(1, n_dim):
                    for _ in range(5):
                        idx = tuple(random.randint(-10, 9) for _ in range(indexes))
                        val = (
                            random.random() + 1
                            if indexes == n_dim
                            else random_nd([10] * (n_dim - indexes), dtype=dtype)
                        )
                        x[idx] = val
                        x_dsc[idx] = val
                        assert all_close(x_dsc.numpy(), x)

    def test_set_full_idx_scalar(self):
        for dtype in DTYPES:
            x = random_nd([4, 4], dtype=dtype)
            x_dsc = dsc.from_numpy(x)
            x[2, 3] = 9.0
            x_dsc[2, 3] = 9.0
            assert all_close(x_dsc.numpy(), x)

    def test_set_slice(self):
        def _shape_from_slice(sl: slice, max_dim: int):
            real_start = sl.start if sl.start >= 0 else sl.start + max_dim
            real_stop = sl.stop if sl.stop >= 0 else sl.stop + max_dim
            return [math.ceil(math.fabs(real_start - real_stop) / math.fabs(sl.step))]

        x_1d = random_nd([10], np.float32)
        x_1d_dsc = dsc.from_numpy(x_1d)

        x_1d[:] = np.ones(10, dtype=np.float32)
        x_1d_dsc[:] = np.ones(10, dtype=np.float32)
        assert all_close(x_1d_dsc.numpy(), x_1d)

        for start in range(-10, 10):
            for stop in range(-10, 10):
                for step in (-3, -1, 1, 2):
                    s = slice(start, stop, step)
                    if not _validate_slice(s, 10):
                        continue
                    x_1d[s] = 1516.0
                    x_1d_dsc[s] = 1516.0
                    assert all_close(x_1d_dsc.numpy(), x_1d)

                    val = random_nd(_shape_from_slice(s, 10), dtype=np.float32)
                    x_1d[s] = val
                    x_1d_dsc[s] = val
                    assert all_close(x_1d_dsc.numpy(), x_1d)

        x_2d = random_nd([5, 5], np.float32)
        x_2d_dsc = dsc.from_numpy(x_2d)

        for extra_dim in range(-5, 5):
            for start in range(-5, 5):
                for stop in range(-5, 5):
                    for step in (-2, 1, 3):
                        s = slice(start, stop, step)
                        if not _validate_slice(s, 5):
                            continue
                        x_2d[(extra_dim, s)] = 12.0
                        x_2d_dsc[(extra_dim, s)] = 12.0
                        assert all_close(x_2d_dsc.numpy(), x_2d)

                        x_2d[(s, extra_dim)] = -1.55
                        x_2d_dsc[(s, extra_dim)] = -1.55
                        assert all_close(x_2d_dsc.numpy(), x_2d)

                        val_shape = _shape_from_slice(s, 5)
                        val = random_nd(val_shape, np.float32)
                        x_2d[(extra_dim, s)] = val
                        x_2d_dsc[(extra_dim, s)] = val
                        assert all_close(x_2d_dsc.numpy(), x_2d)

                        val = random_nd(val_shape, np.float32)
                        x_2d[(s, extra_dim)] = val
                        x_2d_dsc[(s, extra_dim)] = val
                        assert all_close(x_2d_dsc.numpy(), x_2d)

    def test_set_writes_through_views(self):
        x = dsc.zeros((2, 8))
        flat = x.reshape(16)
        x[1, :] = 3.0
        assert all_close(flat.numpy()[8:], np.full(8, 3.0))

    def test_set_cyclic(self):
        # RHS cycles modulo its element count when shapes don't broadcast
        # (reference dsc.cpp:1032-1040)
        x = dsc.zeros((6,))
        x[:] = dsc.from_numpy(np.array([1.0, 2.0], dtype=np.float32))
        assert all_close(x.numpy(), np.array([1, 2, 1, 2, 1, 2], dtype=np.float32))
