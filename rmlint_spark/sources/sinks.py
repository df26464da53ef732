"""Output sinks — the formatter registry analog.

Reference: lib/formats.c:87-124 registers 13 handlers, each fed every
result record (rm_fmt_write, lib/formats.h:184). Spark inversion: the
pipeline writes ONE canonical cluster DataFrame; every other format
derives from it (cheap projections, not a fan-out bus).

| sink | reference | here |
|---|---|---|
| json   | lib/formats/json.c:179-396 | json lines + header/footer objects (K1) |
| csv    | lib/formats/csv.c:1-118    | type,path,size,checksum rows (K2) |
| sh     | lib/formats/sh.c.in        | remediation script w/ handler enum (K3) |
| fdupes | lib/formats/fdupes.c:1-114 | blank-line-separated groups (K4) |
| uniques| lib/formats/uniques.c:1-81 | one path per line (K5) |
| stats/summary | lib/formats/stats.c, summary.c | session totals dict (K6) |
| checkpoint append | lib/xattr.c:218-243 (--xattr-write) | signature-table append (K7) |
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# remediation handlers supported by the sh sink
# (reference lib/formats/sh.c.in:202-217)
SH_HANDLERS = {"remove", "symlink", "hardlink", "clone", "reflink", "usercmd"}


def write_json(clusters: DataFrame, path: str, stats: dict | None = None) -> None:
    """K1: canonical JSON-lines output with header/footer objects, the
    de-facto public contract (json.c:179-216 header, :218-251 footer)."""
    body = clusters.select(
        F.to_json(
            F.struct(
                F.lit("duplicate_file").alias("type"),
                "repo", "path", "commit", "size",
                F.col("checksum"), F.col("cluster_id"),
                F.col("is_original"), (F.col("cluster_size") - 1).alias("twins"),
            )
        ).alias("line")
    )
    body.write.mode("overwrite").text(path)
    header = {"description": "rmlint_spark json-lines output", "checksum_type": "sha256"}
    footer = stats or {}
    with open(f"{path}/_header.json", "w") as f:
        json.dump(header, f)
    with open(f"{path}/_footer.json", "w") as f:
        json.dump(footer, f, default=str)


def write_csv(clusters: DataFrame, path: str) -> None:
    """K2: type,path,size,checksum (csv.c:1-118)."""
    clusters.select(
        F.lit("duplicate_file").alias("type"),
        F.concat_ws(":", "repo", "path").alias("path"),
        "size",
        "checksum",
    ).write.mode("overwrite").option("header", True).csv(path)


def _sh_quote(col: F.Column) -> F.Column:
    """Single-quote a path for POSIX sh, escaping embedded quotes as
    '\\'' — the table analog of the reference's path escaping before
    command emission (lib/formats/sh.c.in). Newlines and other shell
    metacharacters are inert inside single quotes."""
    return F.concat(F.lit("'"), F.replace(col, F.lit("'"), F.lit("'\\''")), F.lit("'"))


def sh_script(clusters: DataFrame, handler: str = "remove", user_cmd: str | None = None) -> DataFrame:
    """K3: one remediation command per non-original row. ``usercmd``
    substitutes $1 = dupe, $2 = original (sh.c.in:75-82); both are
    substituted pre-quoted (never raw) so hostile paths can't inject."""
    if handler not in SH_HANDLERS:
        raise ValueError(f"unknown sh handler {handler!r}")
    dupe = F.concat_ws(":", "repo", "path")
    orig = F.first(F.when(F.col("is_original"), dupe), ignorenulls=True).over(
        W.partitionBy("cluster_id")
    )
    q_dupe, q_orig = _sh_quote(dupe), _sh_quote(orig)
    if handler == "remove":
        cmd = F.concat(F.lit("rm -f "), q_dupe)
    elif handler in {"symlink", "hardlink", "clone", "reflink"}:
        flag = {"symlink": "-s", "hardlink": "", "clone": "--reflink=always", "reflink": "--reflink"}[handler]
        base = "ln" if handler in {"symlink", "hardlink"} else "cp"
        prefix = f"{base} {flag} ".replace("  ", " ")
        cmd = F.concat(F.lit(prefix), q_orig, F.lit(" "), q_dupe)
    else:  # usercmd
        tmpl = user_cmd or "echo dupe: $1 original: $2"
        cmd = F.lit(tmpl)
        cmd = F.replace(cmd, F.lit("$1"), q_dupe)
        cmd = F.replace(cmd, F.lit("$2"), q_orig)
    return (
        clusters.withColumn("cmd", cmd)
        .filter(~F.col("is_original"))
        .select("cluster_id", "cmd")
    )


def fdupes_lines(clusters: DataFrame) -> DataFrame:
    """K4: groups as collected path lists (blank-line groups when
    rendered; fdupes.c:1-114)."""
    return (
        clusters.groupBy("cluster_id")
        .agg(F.sort_array(F.collect_list(F.concat_ws(":", "repo", "path"))).alias("paths"))
        .select("cluster_id", "paths")
    )


def summary(clusters: DataFrame) -> dict:
    """K6: session totals (summary.c; counters lib/session.h:84-101)."""
    from rmlint_spark.operators.exact import session_totals

    row = session_totals(clusters).collect()[0]
    return {k: row[k] for k in row.asDict()}


def write_json_dirs(dirs: DataFrame, path: str) -> None:
    """K1 extension: pack duplicate DIRECTORIES into the json-lines
    stream (reference packs dupe dirs into replay JSON,
    lib/replay.c:686-775; emitted by the treemerge extract phase)."""
    body = dirs.select(
        F.to_json(
            F.struct(
                F.lit("duplicate_dir").alias("type"),
                "repo",
                F.col("dir").alias("path"),
                "n_files", "set_sig", "cluster_id", "is_original",
            )
        ).alias("line")
    )
    body.write.mode("overwrite").text(path)


def replay_source(spark, path: str) -> DataFrame:
    """S4 replay source: re-ingest a prior run's json-lines output as
    input (lib/replay.c:777-860 — the -Y/--replay mode; dupe-dir
    unpack :686-775). Hadoop readers skip the _header/_footer side
    files automatically (leading underscore)."""
    return spark.read.json(path)


def write_stamp(path: str, at: float | None = None) -> float:
    """K6 stamp sink (rmlint ``--stamp-file``/``-O stamp``): record the
    run's completion time so the NEXT incremental run can use it as
    its ``-N`` newness cutoff (pairs with split.needs_new_qualify).
    Returns the recorded epoch seconds."""
    import time as _time

    at = _time.time() if at is None else float(at)
    with open(path, "w") as f:
        f.write(f"{at:.6f}\n")
    return at


def read_stamp(path: str) -> float | None:
    """Read a prior run's stamp; None when absent (first run)."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return float(f.read().strip())


def equal_check(files: DataFrame) -> bool:
    """K6 ``_equal`` sink (lib/formats/_equal.c; rmlint ``--equal``):
    True iff ALL given rows are byte-identical (>= 2 rows, one distinct
    content). The caller maps this to an exit code."""
    row = files.agg(
        F.count_distinct("content").alias("n_distinct"),
        F.count("*").alias("n"),
    ).collect()[0]
    return row["n"] >= 2 and row["n_distinct"] == 1


def append_signatures(clusters: DataFrame, store_path: str) -> None:
    """K7 (--xattr-write analog): persist computed digests so future
    runs short-circuit (R4). Append-only parquet signature table."""
    clusters.select("repo", "path", "commit", "size", "checksum").write.mode(
        "append"
    ).parquet(store_path)


# The emitted python remediation script (K3 sibling). The reference
# embeds lib/formats/py.py into the binary and the py formatter writes
# it out verbatim, chmod +x, while delegating every record to the JSON
# handler writing ``.rmlint.json`` next to it (lib/formats/py.c.in:
# 35,53-73). Same shape here: the script below is written to the sink
# path and reads the json-lines directory the sink writes alongside.
# Deliberately stdlib-only and hackable, like the original's
# "clean and hackable" charter (lib/formats/py.py:26-28).
PY_REMEDIATION_SOURCE = '''#!/usr/bin/env python3
"""rmlint_spark remediation script (py formatter analog).

Reads rmlint_spark json-lines output (default: the %(data)s directory
written next to this script) and handles every non-original row.
Records carry virtual (repo, path) coordinates; --root maps them to
the filesystem as <root>/<repo>/<path>.
"""
import argparse
import filecmp
import glob
import json
import os
import shutil
import sys


def original_check(path, original, be_paranoid=True):
    """Refuse to remove when the pair no longer looks like a dup
    (same-inode / size-drift / --paranoid byte recheck)."""
    try:
        stat_p, stat_o = os.stat(path), os.stat(original)
        if (stat_p.st_dev, stat_p.st_ino) == (stat_o.st_dev, stat_o.st_ino):
            print("# same inode; ignoring: %%s <=> %%s" %% (original, path))
            return False
        if stat_p.st_size != stat_o.st_size:
            print("# size differs; ignoring: %%s <=> %%s" %% (original, path))
            return False
        if be_paranoid and not filecmp.cmp(path, original, shallow=False):
            print("# content differs; ignoring: %%s <=> %%s" %% (original, path))
            return False
        return True
    except OSError as exc:
        print("# %%s" %% exc, file=sys.stderr)
        return False


def handle_duplicate_file(path, original, args):
    if original is None:
        print("# no original for %%s; skipping" %% path)
        return
    if original_check(path, original, be_paranoid=args.paranoid):
        print("rm %%s" %% path)
        if not args.dry_run:
            os.remove(path)


def handle_duplicate_dir(path, original, args):
    print("rmtree %%s" %% path)
    if not args.dry_run:
        shutil.rmtree(path)


def handle_empty_file(path, original, args):
    print("rm %%s" %% path)
    if not args.dry_run:
        os.remove(path)


def handle_empty_dir(path, original, args):
    print("rmdir %%s" %% path)
    if not args.dry_run:
        os.rmdir(path)


def handle_badlink(path, original, args):
    print("rm %%s" %% path)
    if not args.dry_run:
        os.remove(path)


OPERATIONS = {
    "duplicate_file": handle_duplicate_file,
    "duplicate_dir": handle_duplicate_dir,
    "emptyfile": handle_empty_file,
    "emptydir": handle_empty_dir,
    "badlink": handle_badlink,
}


def iter_records(data_dir):
    for fn in sorted(glob.glob(os.path.join(data_dir, "part-*"))):
        with open(fn) as f:
            for line in f:
                if line.strip():
                    yield json.loads(line)


def fs_path(rec, root):
    return os.path.join(root, rec.get("repo") or "", rec["path"])


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data_dir", nargs="?",
                   default=os.path.join(os.path.dirname(
                       os.path.abspath(__file__)) or ".", %(data)r))
    p.add_argument("-n", "--dry-run", action="store_true",
                   help="print operations without performing them")
    p.add_argument("-d", "--no-ask", action="store_true",
                   help="do not ask for confirmation before running")
    p.add_argument("-p", "--paranoid", action="store_true",
                   help="byte-recheck each dup against its original")
    p.add_argument("--root", default=".",
                   help="filesystem root the (repo, path) records map under")
    args = p.parse_args()

    if not args.no_ask and not args.dry_run:
        print("About to modify files under %%s. Press Enter to continue, "
              "CTRL-C to exit (use -d to skip this prompt)." %% args.root,
              file=sys.stderr)
        sys.stdin.read(1)

    clusters = {}
    for rec in iter_records(args.data_dir):
        clusters.setdefault(rec.get("cluster_id"), []).append(rec)

    handled = 0
    for rows in clusters.values():
        rows.sort(key=lambda r: (not r.get("is_original"), r["path"]))
        original = (fs_path(rows[0], args.root)
                    if rows[0].get("is_original") else None)
        for rec in rows:
            if rec.get("is_original"):
                print("keep %%s" %% fs_path(rec, args.root))
                continue
            op = OPERATIONS.get(rec.get("type"))
            if op is None:
                print("# unknown type %%r; skipping" %% rec.get("type"))
                continue
            try:
                op(fs_path(rec, args.root), original, args)
                handled += 1
            except OSError as err:
                print("# %%s" %% err, file=sys.stderr)
    print("# done; %%d record(s) handled%%s"
          %% (handled, " (dry run)" if args.dry_run else ""))


if __name__ == "__main__":
    main()
'''


def write_py(clusters: DataFrame, path: str, data_path: str | None = None,
             stats: dict | None = None) -> None:
    """K3 sibling — the 13th reference formatter (``-o py``): emit an
    executable python remediation script and delegate the records to
    the JSON sink (lib/formats/py.c.in:53-73 writes the embedded
    lib/formats/py.py, chmod +x, and feeds every record to the JSON
    handler writing ``.rmlint.json``). ``data_path`` defaults to
    ``<path>.json`` next to the script."""
    data_path = data_path or path + ".json"
    write_json(clusters, data_path, stats=stats)
    with open(path, "w") as f:
        f.write(PY_REMEDIATION_SOURCE % {"data": os.path.basename(data_path)})
    os.chmod(path, 0o700)  # S_IRUSR|S_IWUSR|S_IXUSR — py.c.in:60-63


# ---------------------------------------------------------------- registry
# Formatter registration channel (rm_fmt_register/rm_fmt_open,
# lib/formats.c:87-124): sinks are looked up by name and can be added
# by callers; ``write_all`` fans one cluster relation out to many
# formats, each with its own config dict (the per-formatter config
# channel, lib/formats.h:110-130).

FORMATTERS: dict[str, object] = {}


def register_formatter(name: str, fn) -> None:
    FORMATTERS[name] = fn


def get_formatter(name: str):
    try:
        return FORMATTERS[name]
    except KeyError:
        raise ValueError(f"unknown formatter {name!r}; registered: {sorted(FORMATTERS)}")


register_formatter("json", write_json)
register_formatter("csv", write_csv)
register_formatter("sh", sh_script)
register_formatter("fdupes", fdupes_lines)
register_formatter("json_dirs", write_json_dirs)
register_formatter("py", write_py)


def write_all(clusters: DataFrame, specs: dict[str, dict]) -> dict[str, object]:
    """Run several formatters over ONE cluster relation:
    ``specs = {"json": {"path": ...}, "sh": {"handler": "remove"}}``.
    Returns each formatter's result (None for file writers,
    a DataFrame for relational sinks)."""
    return {name: get_formatter(name)(clusters, **kw) for name, kw in specs.items()}
