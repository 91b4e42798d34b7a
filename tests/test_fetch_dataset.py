"""S6 downloader tests — fully offline via file:// URLs.

The reference's download.ts is network-bound; the container is not, so the
full fetch→extract→decode path is exercised against a local tarball served
through ``urllib``'s file:// handler — same code path, no sockets."""

from __future__ import annotations

import os
import tarfile

import numpy as np
import pytest

from hnsw_spark.sources.fvecs import read_fvecs, write_fvecs
from tools.fetch_dataset import download_file, extract_tar_gz


@pytest.fixture()
def dataset_tarball(tmp_path):
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(20, 8)).astype(np.float32)
    fvecs_path = tmp_path / "mini_base.fvecs"
    write_fvecs(str(fvecs_path), mat)
    archive = tmp_path / "mini.tar.gz"
    with tarfile.open(archive, "w:gz") as tar:
        tar.add(fvecs_path, arcname="mini_base.fvecs")
    return archive, mat


def test_download_extract_decode_roundtrip(spark, tmp_path, dataset_tarball):
    archive, mat = dataset_tarball
    out_dir = tmp_path / "datasets"
    local = download_file(
        f"file://{archive}", str(out_dir), progress=False
    )
    assert os.path.basename(local) == "mini.tar.gz"
    members = extract_tar_gz(local, str(out_dir))
    assert members == ["mini_base.fvecs"]
    df = read_fvecs(spark, str(out_dir / "mini_base.fvecs"))
    rows = df.orderBy("vec_id").collect()
    assert len(rows) == 20
    got = np.array([r.embedding for r in rows], dtype=np.float32)
    np.testing.assert_array_equal(got, mat)


def test_download_skip_if_exists(tmp_path, dataset_tarball):
    archive, _ = dataset_tarball
    out_dir = tmp_path / "d"
    p1 = download_file(f"file://{archive}", str(out_dir), progress=False)
    before = os.path.getmtime(p1)
    p2 = download_file(
        f"file://{archive}", str(out_dir), skip_if_exists=True, progress=False
    )
    assert p1 == p2 and os.path.getmtime(p2) == before  # not re-fetched
    # an empty stale file does NOT count as present (download.ts:47-52)
    open(p1, "w").close()
    download_file(f"file://{archive}", str(out_dir), progress=False)
    assert os.path.getsize(p1) > 0


def test_download_custom_name_and_no_partial_on_failure(tmp_path):
    missing = tmp_path / "nope.tar.gz"
    out_dir = tmp_path / "d"
    with pytest.raises(Exception):
        download_file(f"file://{missing}", str(out_dir), progress=False)
    # stream-to-.part + atomic rename: a failed fetch leaves no output file
    assert not any(f.endswith(".tar.gz") for f in os.listdir(out_dir))
