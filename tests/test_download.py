"""Tests for the explicit dataset fetch tool (data/download.py).

No egress exists in CI, so these cover everything except a live fetch:
registry/loader path agreement, keep-existing behavior, the offline
error message (which carries manual-placement instructions), and the
CLI exit code.  Reference surface: large/dataset.py:371-377 +
large/data_utils.py:303-312.
"""

from __future__ import annotations

import os

import pytest

from sgformer_tpu.data import download as dl


def test_registry_matches_loader_paths(tmp_path):
    """Derived from the LOADER side (ADVICE round 4): place a sentinel
    file at each registry-relative path and assert ``load_dataset``'s own
    file resolution finds and opens it — i.e. it fails PARSING the
    sentinel, not with FileNotFoundError.  A registry path drifting from
    what loaders.py actually reads turns into FileNotFoundError here."""
    from sgformer_tpu.data.loaders import load_dataset

    for name, files in dl.DRIVE_FILES.items():
        data_dir = tmp_path / name.replace("/", "_")
        for rel in files:
            dest = data_dir / rel
            dest.parent.mkdir(parents=True, exist_ok=True)
            dest.write_bytes(b"not a mat file")
        try:
            load_dataset(str(data_dir), name)
        except FileNotFoundError as e:  # pragma: no cover - failure path
            raise AssertionError(
                f"loader for {name!r} did not look at the registry "
                f"path(s) {sorted(files)}: {e}"
            )
        except Exception:
            pass  # found the sentinel and choked on its content: agreement


def test_fetch_keeps_existing_files(tmp_path):
    dest = tmp_path / "pokec" / "pokec.mat"
    dest.parent.mkdir(parents=True)
    dest.write_bytes(b"sentinel")
    written = dl.fetch_dataset("pokec", str(tmp_path))
    assert written == []
    assert dest.read_bytes() == b"sentinel"


def test_unknown_dataset_raises_keyerror(tmp_path):
    with pytest.raises(KeyError, match="ogb"):
        dl.fetch_dataset("ogbn-arxiv", str(tmp_path))


def test_offline_error_names_manual_path(tmp_path, monkeypatch):
    import urllib.error
    import urllib.request

    def no_net(*a, **k):
        raise urllib.error.URLError(OSError("no egress"))

    monkeypatch.setattr(urllib.request, "urlopen", no_net)
    dest = os.path.join(str(tmp_path), "snap_patents.mat")
    with pytest.raises(ConnectionError) as e:
        dl.drive_fetch("1ldh23TSY1PwXia6dU0MYcpyEgX-w3Hia", dest)
    msg = str(e.value)
    assert dest in msg and "drive.google.com" in msg
    assert not os.path.exists(dest + ".part")


def test_cli_offline_exits_nonzero(tmp_path, monkeypatch):
    import urllib.request

    def no_net(*a, **k):
        raise OSError("no egress")

    monkeypatch.setattr(urllib.request, "urlopen", no_net)
    rc = dl.main(["yelp-chi", "--data_dir", str(tmp_path)])
    assert rc == 1


def test_html_error_page_rejected(tmp_path, monkeypatch):
    """Drive quota/interstitial pages come back HTTP-200 text/html; they
    must not be committed as the dataset file (round-4 review)."""
    import io
    import urllib.request

    class FakeResp(io.BytesIO):
        headers = {"Content-Type": "text/html; charset=utf-8"}

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_open(*a, **k):
        return FakeResp(b"<!DOCTYPE html><html>Quota exceeded</html>")

    monkeypatch.setattr(urllib.request, "urlopen", fake_open)
    dest = os.path.join(str(tmp_path), "YelpChi.mat")
    with pytest.raises(ConnectionError, match="HTML"):
        dl.drive_fetch("x", dest)
    assert not os.path.exists(dest) and not os.path.exists(dest + ".part")
