"""S6: HTTP dataset fetch — download a (tar.gz) dataset archive and extract it.

Parity target: reference ``src/bench/download.ts`` — ``downloadFile``
(:36-111: mkdir, skip-if-exists on non-empty file, redirect following,
progress meter, stream-to-file) and ``extractTarGz`` (:113-122), with the
same CLI surface and defaults (:16-34).  SURVEY maps S6 out-of-engine
(the driver provides local fixtures), so this is a standalone tool, not a
Spark source: the downloaded fvecs files are read with
``hnsw_spark.sources.fvecs.read_fvecs``.

Differences from the reference, deliberate:
- ``urllib`` follows HTTP redirects natively (download.ts re-resolves
  relative Location headers by hand, :57-72); ``file://`` URLs also work,
  which is how the offline test exercises the full path.
- extraction uses the stdlib ``tarfile`` with the ``data`` filter (path
  traversal guard) instead of shelling out to ``tar -xzf``.

Usage:
  python tools/fetch_dataset.py [--url URL] [--out DIR] [--name FILE]
                                [--extract] [--skip-if-exists] [--timeout SEC]
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile
import urllib.request
from urllib.parse import urlparse

# download.ts:16 — the reference's default dataset (public SIFT-small mirror)
DEFAULT_URL = (
    "https://huggingface.co/datasets/vecdata/siftsmall/resolve/main/"
    "siftsmall.tar.gz?download=true"
)
DEFAULT_OUT_DIR = "bench/datasets"
CHUNK = 1 << 16


def download_file(
    url: str,
    out_dir: str,
    filename: str | None = None,
    skip_if_exists: bool = True,
    timeout: float = 30.0,
    progress: bool = True,
) -> str:
    """Stream ``url`` to ``out_dir`` and return the local path
    (downloadFile, download.ts:36-111)."""
    os.makedirs(out_dir, exist_ok=True)
    final_name = filename or (
        os.path.basename(urlparse(url).path) or "dataset.tar.gz"
    )
    output_path = os.path.abspath(os.path.join(out_dir, final_name))

    if skip_if_exists and os.path.exists(output_path):
        if os.path.getsize(output_path) > 0:  # download.ts:47-52
            print(f"File already exists: {output_path}")
            return output_path

    print(f"Downloading {url}")
    print(f"-> {output_path}")
    req = urllib.request.Request(url)
    with urllib.request.urlopen(req, timeout=timeout) as res:
        status = getattr(res, "status", 200)
        if status != 200 and urlparse(url).scheme != "file":
            raise RuntimeError(f"Download failed with status {status}")
        total = int(res.headers.get("Content-Length") or 0)
        received = 0
        tmp_path = output_path + ".part"
        with open(tmp_path, "wb") as f:
            while True:
                chunk = res.read(CHUNK)
                if not chunk:
                    break
                f.write(chunk)
                received += len(chunk)
                if progress:  # download.ts:84-92
                    if total > 0:
                        pct = received / total * 100
                        sys.stderr.write(
                            f"\r{pct:.1f}% ({received}/{total} bytes)"
                        )
                    else:
                        sys.stderr.write(f"\r{received} bytes")
        if progress:
            sys.stderr.write("\n")
        os.replace(tmp_path, output_path)  # never leave a truncated file
    return output_path


def extract_tar_gz(archive_path: str, out_dir: str) -> list[str]:
    """Extract ``archive_path`` into ``out_dir``; returns extracted member
    names (extractTarGz, download.ts:113-122)."""
    with tarfile.open(archive_path, "r:gz") as tar:
        members = tar.getmembers()
        try:
            tar.extractall(out_dir, filter="data")
        except TypeError:  # Python < 3.12: no filter kwarg
            tar.extractall(out_dir)
    return [m.name for m in members]


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--url", default=DEFAULT_URL)
    p.add_argument("--out", default=DEFAULT_OUT_DIR)
    p.add_argument("--name")
    p.add_argument("--extract", action="store_true")
    p.add_argument("--skip-if-exists", action="store_true")
    p.add_argument("--timeout", type=float, default=30.0)
    args = p.parse_args()

    try:
        archive = download_file(
            args.url,
            args.out,
            filename=args.name,
            skip_if_exists=args.skip_if_exists,
            timeout=args.timeout,
        )
        if args.extract:
            print(f"Extracting {archive}")
            for name in extract_tar_gz(archive, args.out):
                print(f"  {name}")
    except Exception as err:  # download.ts:168-172
        print(err, file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
