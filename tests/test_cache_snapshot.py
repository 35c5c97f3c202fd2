"""The re-image insurance: restore-from-snapshot semantics.

The build hosts are periodically wiped back to the base image (destroys
~/.cache, keeps committed repo state); gpsat_tpu/__init__ restores the
persistent compile cache from cache_snapshot/gpsat_tpu_jax.tar.xz when the
live cache dir is missing or empty — and must NEVER clobber a live cache.
"""

import os
import tarfile

from gpsat_tpu import _restore_cache_snapshot


def _make_snapshot(repo_like, payload):
    snap_dir = os.path.join(repo_like, "cache_snapshot")
    os.makedirs(snap_dir)
    entry = os.path.join(repo_like, "entry-aaa")
    with open(entry, "wb") as f:
        f.write(payload)
    with tarfile.open(os.path.join(snap_dir, "gpsat_tpu_jax.tar.xz"),
                      "w:xz") as tf:
        tf.add(entry, arcname="entry-aaa")
    os.remove(entry)


def _point_at(monkeypatch, repo_like):
    """Redirect the function's snapshot discovery (abspath of the package
    __init__) into the tmp repo tree."""
    import gpsat_tpu
    real_abspath = os.path.abspath
    monkeypatch.setattr(
        gpsat_tpu.os.path, "abspath",
        lambda p: os.path.join(repo_like, "gpsat_tpu", "__init__.py")
        if p == gpsat_tpu.__file__ else real_abspath(p))


def test_restore_into_empty_dir(tmp_path, monkeypatch):
    repo_like = str(tmp_path / "repo")
    os.makedirs(repo_like)
    _make_snapshot(repo_like, b"cached-bytes")
    cache_dir = str(tmp_path / "cache")
    _point_at(monkeypatch, repo_like)

    _restore_cache_snapshot(cache_dir)
    assert os.path.isfile(os.path.join(cache_dir, "entry-aaa"))
    with open(os.path.join(cache_dir, "entry-aaa"), "rb") as f:
        assert f.read() == b"cached-bytes"


def test_never_clobbers_live_cache(tmp_path, monkeypatch):
    repo_like = str(tmp_path / "repo")
    os.makedirs(repo_like)
    _make_snapshot(repo_like, b"stale")
    cache_dir = str(tmp_path / "cache")
    os.makedirs(cache_dir)
    live = os.path.join(cache_dir, "live-entry")
    with open(live, "w") as f:
        f.write("fresh")
    _point_at(monkeypatch, repo_like)

    _restore_cache_snapshot(cache_dir)
    assert not os.path.exists(os.path.join(cache_dir, "entry-aaa"))
    with open(live) as f:
        assert f.read() == "fresh"


def test_no_snapshot_is_a_noop(tmp_path, monkeypatch):
    repo_like = str(tmp_path / "repo")
    os.makedirs(repo_like)  # no cache_snapshot/ tarball in this tree
    _point_at(monkeypatch, repo_like)
    cache_dir = str(tmp_path / "cache")
    _restore_cache_snapshot(cache_dir)
    assert not (os.path.isdir(cache_dir) and os.listdir(cache_dir))
