#!/usr/bin/env python3
"""Driver-side replica of graft.Bench.corpusFingerprint (Bench.scala):
per-table (rows, bytes) over <dir>/*.parquet, digest = first 6 bytes of
sha256 over "name:rows:bytes" joined with ",". Lets a corpus be
fingerprinted without a Spark session (e.g. the determinism probe that
rebuilds a stress corpus into a scratch dir and compares ids).
Usage: python3 tools/fingerprint.py <dir> [<dir> ...]
"""
import hashlib, os, sys
import pyarrow.parquet as pq


def table_stats(path):
    if os.path.isdir(path):
        bytes_ = 0
        rows = 0
        for root, _, files in os.walk(path):
            for f in files:
                fp = os.path.join(root, f)
                bytes_ += os.path.getsize(fp)
                if f.endswith(".parquet"):
                    rows += pq.ParquetFile(fp).metadata.num_rows
        return rows, bytes_
    return pq.ParquetFile(path).metadata.num_rows, os.path.getsize(path)


def fingerprint(d):
    names = sorted(n for n in os.listdir(d) if n.endswith(".parquet"))
    stats = []
    for n in names:
        rows, b = table_stats(os.path.join(d, n))
        stats.append((n[: -len(".parquet")], rows, b))
    digest_in = ",".join(f"{n}:{r}:{b}" for n, r, b in stats)
    return hashlib.sha256(digest_in.encode()).hexdigest()[:12], stats


if __name__ == "__main__":
    for d in sys.argv[1:]:
        fid, stats = fingerprint(d)
        print(f"{d}: id={fid}")
        for n, r, b in stats:
            print(f"  {n:12s} rows={r:<12d} bytes={b}")
