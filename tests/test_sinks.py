"""Sink/format tests (K1-K7)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from rmlint_spark.config import EngineConfig, SignatureConfig
from rmlint_spark.operators.exact import exact_clusters
from rmlint_spark.sources import sinks

CFG = EngineConfig(sig=SignatureConfig(prefix_len=64))

ROWS = [
    ("r1", "a/x.py", "c1", "python", "DUP ONE"),
    ("r2", "b/y.py", "c2", "python", "DUP ONE"),
    ("r1", "a/z.py", "c1", "python", "DUP TWO"),
    ("r3", "c/w.py", "c3", "python", "DUP TWO"),
    ("r3", "c/u.py", "c3", "python", "unique"),
]


def clusters_df(spark):
    files = spark.createDataFrame(ROWS, ["repo", "path", "commit", "lang", "content"])
    return exact_clusters(files, CFG)


def test_json_sink(spark, tmp_path):
    out = str(tmp_path / "json")
    cl = clusters_df(spark)
    sinks.write_json(cl, out, stats=sinks.summary(cl))
    lines = []
    for fn in os.listdir(out):
        if fn.startswith("part-"):
            with open(os.path.join(out, fn)) as f:
                lines += [json.loads(line) for line in f if line.strip()]
    assert len(lines) == 4
    assert all(l["type"] == "duplicate_file" for l in lines)
    assert all(l["twins"] == 1 for l in lines)
    with open(os.path.join(out, "_footer.json")) as f:
        footer = json.load(f)
    assert footer["dup_group_counter"] == 2


def test_csv_sink(spark, tmp_path):
    out = str(tmp_path / "csv")
    sinks.write_csv(clusters_df(spark), out)
    data = []
    for fn in os.listdir(out):
        if fn.startswith("part-"):
            data += open(os.path.join(out, fn)).read().splitlines()
    assert any(l.startswith("type,path,size,checksum") for l in data)


def test_sh_script_handlers(spark):
    cl = clusters_df(spark)
    rm = sinks.sh_script(cl, "remove").collect()
    assert len(rm) == 2 and all(r["cmd"].startswith("rm -f '") for r in rm)
    ln = sinks.sh_script(cl, "symlink").collect()
    assert all(r["cmd"].startswith("ln -s '") for r in ln)
    uc = sinks.sh_script(cl, "usercmd", user_cmd="compare $1 $2").collect()
    # substitutions arrive pre-quoted (never raw) so paths can't inject
    assert all(r["cmd"].startswith("compare '") and " 'r" in r["cmd"] for r in uc)
    import pytest

    with pytest.raises(ValueError):
        sinks.sh_script(cl, "nonsense")


def test_sh_script_escapes_hostile_paths(spark):
    # a path containing a single quote + metacharacters must not break
    # out of its quoting (reference escapes paths in sh.c.in)
    from pyspark.sql import Row

    rows = [
        Row(repo="r", path="a'; rm -rf /;'.txt", commit="c", cluster_id="x",
            is_original=True),
        Row(repo="r", path="b$(reboot).txt", commit="c", cluster_id="x",
            is_original=False),
    ]
    df = spark.createDataFrame(rows)
    cmds = [r["cmd"] for r in sinks.sh_script(df, "remove").collect()]
    assert cmds == ["rm -f 'r:b$(reboot).txt'"]
    ln = [r["cmd"] for r in sinks.sh_script(df, "symlink").collect()]
    # the original's embedded quote is escaped as '\''
    assert ln == ["ln -s 'r:a'\\''; rm -rf /;'\\''.txt' 'r:b$(reboot).txt'"]


def test_fdupes_groups(spark):
    groups = sinks.fdupes_lines(clusters_df(spark)).collect()
    assert len(groups) == 2
    assert all(len(g["paths"]) == 2 for g in groups)


def test_signature_append_roundtrip(spark, tmp_path):
    store = str(tmp_path / "store")
    cl = clusters_df(spark)
    sinks.append_signatures(cl, store)
    back = spark.read.parquet(store)
    assert back.count() == 4
    assert set(back.columns) == {"repo", "path", "commit", "size", "checksum"}


def test_replay_roundtrip_with_dirs(spark, tmp_path):
    # K1 json pack -> S4 replay unpack, files + duplicate dirs
    # (lib/replay.c:686-775,777-860)
    out = str(tmp_path / "json_out")
    sinks.write_json(clusters_df(spark), out)
    back = sinks.replay_source(spark, out)
    assert back.count() == 4
    assert set(back.select("type").distinct().toPandas()["type"]) == {"duplicate_file"}

    from pyspark.sql import Row

    dirs = spark.createDataFrame(
        [
            Row(repo="r1", dir="d1", n_files=2, set_sig="S", cluster_id="S",
                is_original=True),
            Row(repo="r2", dir="d2", n_files=2, set_sig="S", cluster_id="S",
                is_original=False),
        ]
    )
    out2 = str(tmp_path / "json_dirs")
    sinks.write_json_dirs(dirs, out2)
    back2 = sinks.replay_source(spark, out2)
    assert back2.count() == 2
    assert back2.filter("type = 'duplicate_dir'").count() == 2


def test_formatter_registry(spark, tmp_path):
    import pytest

    res = sinks.write_all(
        clusters_df(spark),
        {"sh": {"handler": "remove"}, "fdupes": {}},
    )
    assert res["sh"].count() == 2 and res["fdupes"].count() == 2
    with pytest.raises(ValueError):
        sinks.get_formatter("nope")
    sinks.register_formatter("mine", lambda df: df.count())
    assert sinks.get_formatter("mine")(clusters_df(spark)) == 4


def _materialize_tree(root, rows):
    for repo, path, _commit, _lang, content in rows:
        p = root / repo / path
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)


def test_py_sink_executes_remediation(spark, tmp_path):
    """The 13th reference formatter (``-o py``): the emitted script is
    executable, reads the delegated json-lines data, removes dupes and
    keeps originals — mirroring the reference's sh/py script tests
    which run the emitted script on a real tree (tests/conftest.py:10-12
    precedent; lib/formats/py.py handlers)."""
    import stat
    import subprocess

    script = str(tmp_path / "remediate.py")
    sinks.write_py(clusters_df(spark), script)
    assert os.stat(script).st_mode & stat.S_IXUSR
    assert os.path.isdir(script + ".json")  # delegated JSON data

    tree = tmp_path / "tree"
    _materialize_tree(tree, ROWS)

    # dry run: prints rm lines, modifies nothing
    dry = subprocess.run(
        [script, "-n", "-d", "--root", str(tree)],
        capture_output=True, text=True, check=True,
    )
    assert dry.stdout.count("rm ") == 2 and dry.stdout.count("keep ") == 2
    assert sum(1 for _ in tree.rglob("*") if _.is_file()) == 5

    # real run: the two non-originals go, originals + unique stay
    subprocess.run([script, "-d", "--root", str(tree)], check=True,
                   capture_output=True, text=True)
    left = {str(p.relative_to(tree)) for p in tree.rglob("*") if p.is_file()}
    assert len(left) == 3 and "r3/c/u.py" in left


def test_py_sink_paranoid_skips_drifted_content(spark, tmp_path):
    """--paranoid byte-rechecks each dup against its original before
    removal (original_check, lib/formats/py.py:59-81): a file whose
    content drifted after the scan must survive."""
    import subprocess

    script = str(tmp_path / "remediate.py")
    cl = clusters_df(spark)
    sinks.write_py(cl, script)
    tree = tmp_path / "tree"
    _materialize_tree(tree, ROWS)

    # tamper with every non-original AFTER the scan (same byte length
    # so only the -p byte compare can notice)
    dupes = [r["path"] for r in cl.filter("NOT is_original").collect()]
    repos = {r["path"]: r["repo"] for r in cl.collect()}
    for p in dupes:
        f = tree / repos[p] / p
        f.write_text("X" * len(f.read_text()))

    out = subprocess.run(
        [script, "-d", "-p", "--root", str(tree)],
        capture_output=True, text=True, check=True,
    )
    assert out.stdout.count("content differs") == 2
    assert sum(1 for _ in tree.rglob("*") if _.is_file()) == 5  # nothing removed
