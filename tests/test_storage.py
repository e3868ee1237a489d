import pyarrow as pa

from newscrawler_ray.sources.storage import HAVE_LANCE, read_table_dataset, write_table


def test_roundtrip(ray_session, tmp_path):
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    path = write_table(t, tmp_path / "t")
    ds = read_table_dataset(path)
    assert ds.count() == 3
    assert sorted(ds.schema().names) == ["a", "b"]
    pruned = read_table_dataset(path, columns=["a"])
    assert pruned.schema().names == ["a"]


def test_shim_mode_is_parquet_in_sandbox():
    assert HAVE_LANCE is False  # lance not installable here (SURVEY §7.0)
