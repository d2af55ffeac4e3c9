"""Dataset fetcher: registry integrity, extraction, air-gap behavior.

No network is touched — downloads are exercised against file:// URLs and
a monkeypatched failing opener (this environment has zero egress).
"""
import tarfile
import zipfile
from pathlib import Path

import pytest

from fusionsense_tpu.data.download import (
    MUSHROOM_ROOMS, REGISTRY, fetch, main,
)


def test_registry_covers_reference_scripts():
    # one entry per reference download script
    # (dn_splatter/data/download_scripts/)
    assert set(REGISTRY) == {"mushroom", "replica", "dtu", "nrgbd",
                             "omnidata"}
    for name in ("replica", "dtu", "nrgbd", "omnidata"):
        arts = REGISTRY[name]()
        assert arts and all(a.url.startswith(("http://", "https://"))
                            for a in arts)
    # mushroom: every room x sequence resolves to per-record zenodo URLs
    arts = REGISTRY["mushroom"](room="sauna", sequence="all")
    assert [a.url.rsplit("/", 1)[-1] for a in arts] == [
        "sauna_iphone.tar.gz", "sauna_kinect.tar.gz", "sauna_mesh_pd.tar.gz"]
    assert len(MUSHROOM_ROOMS) == 10
    with pytest.raises(ValueError):
        REGISTRY["mushroom"](room="nope", sequence="all")


def test_fetch_extracts_local_archive(tmp_path, monkeypatch):
    # stage a tiny tar.gz behind a file:// URL and point one registry
    # entry at it
    src = tmp_path / "stage"
    src.mkdir()
    (src / "long_capture").mkdir()
    (src / "long_capture" / "transforms.json").write_text("{}")
    archive = tmp_path / "activity_iphone.tar.gz"
    with tarfile.open(archive, "w:gz") as tf:
        tf.add(src / "long_capture", arcname="long_capture")

    from fusionsense_tpu.data import download as dl

    monkeypatch.setitem(
        dl.REGISTRY, "mushroom",
        lambda room, sequence: [dl.Artifact(archive.as_uri(),
                                            extract_to=room)])
    out = fetch("mushroom", tmp_path / "datasets", room="activity",
                sequence="iphone", log=lambda *a, **k: None)
    got = tmp_path / "datasets" / "activity" / "long_capture"
    assert out == [tmp_path / "datasets" / "activity"]
    assert (got / "transforms.json").read_text() == "{}"
    # archive consumed (keep_archives=False default)
    assert not (tmp_path / "datasets" / "activity_iphone.tar.gz").exists()


def test_fetch_zip_and_single_file(tmp_path):
    from fusionsense_tpu.data import download as dl

    z = tmp_path / "Replica.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("room_0/traj.txt", "data")
    ckpt = tmp_path / "weights.ckpt"
    ckpt.write_bytes(b"\x00" * 16)

    arts = [dl.Artifact(z.as_uri(), extract_to=""),
            dl.Artifact(ckpt.as_uri(), extract_to=None)]
    dl.REGISTRY["_test"] = lambda: arts
    try:
        out = fetch("_test", tmp_path / "d", log=lambda *a, **k: None)
    finally:
        del dl.REGISTRY["_test"]
    assert (tmp_path / "d" / "room_0" / "traj.txt").exists()
    assert out[1].read_bytes() == b"\x00" * 16


def test_airgap_error_lists_all_urls(tmp_path):
    # zero-egress: the unreachable host must surface every URL to mirror
    with pytest.raises(RuntimeError) as ei:
        fetch("nrgbd", tmp_path, log=lambda *a, **k: None)
    msg = str(ei.value)
    assert "neural_rgbd_data.zip" in msg and "meshes.zip" in msg
    assert str(tmp_path) in msg


def test_cli_unknown_and_airgap(tmp_path, capsys):
    with pytest.raises(SystemExit):
        main(["not-a-dataset"])
    rc = main(["omnidata", "--save-dir", str(tmp_path)])
    assert rc == 1
    assert "omnidata_dpt_normal_v2.ckpt" in capsys.readouterr().err


def test_fetch_skips_already_extracted(tmp_path, monkeypatch):
    """Re-running fetch after the archive was consumed must NOT re-download
    (ADVICE r4: keep_archives=False deleted the archive, and the old code
    re-fetched multi-GB artifacts on every rerun)."""
    src = tmp_path / "stage"
    src.mkdir()
    (src / "capture").mkdir()
    (src / "capture" / "transforms.json").write_text("{}")
    archive = tmp_path / "room.tar.gz"
    with tarfile.open(archive, "w:gz") as tf:
        tf.add(src / "capture", arcname="capture")

    from fusionsense_tpu.data import download as dl

    calls = []
    real = dl._stream_download

    def counting(url, dest, log=print):
        calls.append(url)
        return real(url, dest, log=log)

    monkeypatch.setattr(dl, "_stream_download", counting)
    monkeypatch.setitem(
        dl.REGISTRY, "mushroom",
        lambda room, sequence: [dl.Artifact(archive.as_uri(),
                                            extract_to=room)])
    kw = dict(room="activity", sequence="iphone", log=lambda *a, **k: None)
    out1 = fetch("mushroom", tmp_path / "d", **kw)
    assert len(calls) == 1
    assert not (tmp_path / "d" / "room.tar.gz").exists()  # archive consumed
    out2 = fetch("mushroom", tmp_path / "d", **kw)   # idempotent re-run
    assert len(calls) == 1, "re-run re-downloaded the archive"
    assert out1 == out2
