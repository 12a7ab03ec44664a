"""Tar archive source round-trip (sources/archive.py — the literal S7
reference format, eval_zeshel_gcp.py:86-89)."""

import io
import tarfile

from entity_linking_spark.sources.archive import read_tar_members


def _make_tar(path, members, mode="w:gz"):
    with tarfile.open(path, mode) as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        # a directory member — must NOT surface as a row
        d = tarfile.TarInfo(name="docs")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)


def test_tar_members_round_trip(spark, tmp_path):
    members_a = {
        "docs/one.json": b'{"id": 1}',
        "docs/two.txt": b"hello tar",
    }
    members_b = {"notes/three.json": b'{"id": 3}' * 100}
    _make_tar(str(tmp_path / "a.tar.gz"), members_a)
    _make_tar(str(tmp_path / "b.tar.gz"), members_b)

    df = read_tar_members(spark, str(tmp_path / "*.tar.gz"))
    rows = {r["path"]: r for r in df.collect()}
    expect = {**members_a, **members_b}
    assert set(rows) == set(expect)
    for p, data in expect.items():
        assert bytes(rows[p]["content"]) == data
        assert rows[p]["size"] == len(data)
    assert rows["docs/one.json"]["archive"].endswith("a.tar.gz")
    assert rows["notes/three.json"]["archive"].endswith("b.tar.gz")


def test_tar_member_glob_filters_executor_side(spark, tmp_path):
    _make_tar(
        str(tmp_path / "c.tar.gz"),
        {"x/a.json": b"{}", "x/b.txt": b"no", "y/c.json": b"[]"},
    )
    df = read_tar_members(spark, str(tmp_path / "c.tar.gz"), member_glob="*.json")
    assert sorted(r["path"] for r in df.collect()) == ["x/a.json", "y/c.json"]


def test_uncompressed_tar_autodetected(spark, tmp_path):
    _make_tar(str(tmp_path / "plain.tar"), {"f.bin": b"\x00\x01\x02"}, mode="w")
    [row] = read_tar_members(spark, str(tmp_path / "plain.tar")).collect()
    assert bytes(row["content"]) == b"\x00\x01\x02"
