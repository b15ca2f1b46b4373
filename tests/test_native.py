"""Native C++ OBJ IO: equivalence with the pure-Python path (the semantics
oracle) and error behavior."""

import numpy as np
import pytest

from a_robust_registration_loss_tpu.data import objio
from a_robust_registration_loss_tpu.native import objio_native


pytestmark = pytest.mark.skipif(
    not objio_native.available(), reason="no C++ toolchain to build libobjio"
)


def _py_read(path):
    """The pure-Python parser regardless of the native fast path."""
    import a_robust_registration_loss_tpu.data.objio as m

    old = m._native
    m._native = lambda: None
    try:
        return m.read_obj(path)
    finally:
        m._native = old


def _py_write(path, v, f=None):
    import a_robust_registration_loss_tpu.data.objio as m

    old = m._native
    m._native = lambda: None
    try:
        m.write_obj(path, v, f)
    finally:
        m._native = old


class TestNativeObjIO:
    def test_roundtrip_matches_python(self, tmp_path, rng):
        v = (rng.standard_normal((500, 3)) * 3).astype(np.float32)
        f = rng.integers(0, 500, (120, 3)).astype(np.int32)
        p_nat = str(tmp_path / "nat.obj")
        p_py = str(tmp_path / "py.obj")
        objio_native.write_obj(p_nat, v, f)
        _py_write(p_py, v, f)
        assert open(p_nat).read() == open(p_py).read()

        vn, fn = objio_native.read_obj(p_nat)
        vp, fp = _py_read(p_nat)
        np.testing.assert_array_equal(vn, vp)
        np.testing.assert_array_equal(fn, fp)
        np.testing.assert_allclose(vn, v, rtol=1e-6)
        np.testing.assert_array_equal(fn, f)

    def test_reads_reference_sample(self):
        path = "/root/reference/code/sample_data/airplane_data/0_src_sample.obj"
        import os

        if not os.path.exists(path):
            pytest.skip("reference sample data not mounted")
        vn, fn = objio_native.read_obj(path)
        vp, fp = _py_read(path)
        np.testing.assert_array_equal(vn, vp)
        np.testing.assert_array_equal(fn, fp)
        assert vn.shape == (1024, 3)

    def test_slash_suffix_faces(self, tmp_path):
        p = str(tmp_path / "s.obj")
        with open(p, "w") as f:
            f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1/1/1 2/2/2 3/3/3\n")
        vn, fn = objio_native.read_obj(p)
        np.testing.assert_array_equal(fn, [[0, 1, 2]])

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(IOError):
            objio_native.read_obj(str(tmp_path / "nope.obj"))

    def test_default_path_uses_native(self, tmp_path, rng):
        """data/objio.py routes through the fast path when available."""
        v = rng.standard_normal((64, 3)).astype(np.float32)
        p = str(tmp_path / "d.obj")
        objio.write_obj(p, v)
        v2, f2 = objio.read_obj(p)
        np.testing.assert_allclose(v2, v, rtol=1e-6)
        assert f2.shape == (0, 3)
