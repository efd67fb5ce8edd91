"""Utils tests: MD5 fetcher gating, NaN debugging, imagenet prep helpers,
HybridConditioner. Reference semantics: SURVEY.md §2.13, §5.2, Lpips/utils.py."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_md5_and_download_gating(tmp_path):
    from sd_tpu.utils.fetch import download_with_md5, md5_hash

    p = tmp_path / "w.bin"
    p.write_bytes(b"hello weights")
    h = md5_hash(str(p))
    # existing file with matching md5 passes through
    assert download_with_md5("http://example.invalid/x", str(p), h) == str(p)
    # md5 mismatch raises
    with pytest.raises(IOError):
        download_with_md5("http://example.invalid/x", str(p), "0" * 32)
    # missing file + no egress raises with guidance
    with pytest.raises(IOError, match="place the file"):
        download_with_md5("http://example.invalid/x", str(tmp_path / "nope"), h)


def test_tree_finite_summary():
    from sd_tpu.utils.debug import tree_finite_summary

    ok = tree_finite_summary({"a": jnp.ones(3), "b": jnp.zeros(2)})
    assert ok["finite"]
    bad = tree_finite_summary({"a": jnp.array([1.0, np.nan]),
                               "b": jnp.array([np.inf])})
    assert not bad["finite"]
    assert int(bad["num_nan"]) == 1 and int(bad["num_inf"]) == 1


def test_nan_check_checkify():
    from sd_tpu.utils.debug import nan_check

    import jax

    f = nan_check(lambda x: jnp.log(x))
    err, out = jax.jit(f)(jnp.array([-1.0]))
    with pytest.raises(Exception):
        err.throw()
    err2, out2 = jax.jit(f)(jnp.array([1.0]))
    err2.throw()  # no error


def test_retrieve_and_markers(tmp_path):
    from sd_tpu.data.imagenet_utils import (
        is_prepared,
        mark_prepared,
        retrieve,
        str_to_indices,
        write_filelist,
    )

    cfg = {"a": {"b": [10, {"c": 42}]}}
    assert retrieve(cfg, "a/b/1/c") == 42
    assert retrieve(cfg, "a/missing", default="d") == "d"

    assert str_to_indices("0,3-5,9") == [0, 3, 4, 5, 9]

    root = str(tmp_path / "prep")
    assert not is_prepared(root)
    mark_prepared(root)
    assert is_prepared(root)

    d = tmp_path / "imgs"
    d.mkdir()
    for n in ("b.JPEG", "a.JPEG", "c.txt"):
        (d / n).write_bytes(b"x")
    out = tmp_path / "list.txt"
    assert write_filelist(str(d), str(out)) == 2
    assert out.read_text().splitlines() == ["a.JPEG", "b.JPEG"]


def test_hybrid_conditioner(rng):
    from flax import linen as nn

    from sd_tpu.models.conditioners import HybridConditioner

    class Id(nn.Module):
        @nn.compact
        def __call__(self, x):
            return x * self.param("s", nn.initializers.ones, ())

    hc = HybridConditioner(concat_conditioner=Id(), crossattn_conditioner=Id())
    cc = jnp.ones((1, 4, 4, 2))
    ca = jnp.ones((1, 7, 8))
    params = hc.init(rng, cc, ca)
    out = hc.apply(params, cc, ca)
    assert out["c_concat"][0].shape == cc.shape
    assert out["c_crossattn"][0].shape == ca.shape
