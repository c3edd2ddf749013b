"""`ray job submit` entrypoint (scripts/job_build.py): the north rule's
cluster-job surface.  Inside a submitted job the script connects to the
hosting cluster; here the session fixture's Ray stands in for it (the
owns_session guard keeps the script from shutting it down), so main() runs
in-process and we assert the JSON contract + lineage resume."""

import importlib.util
import json
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "job_build",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "job_build.py"),
)
job_build = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(job_build)


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    from engine.synth import write_pages

    d = str(tmp_path_factory.mktemp("job") / "pages")
    write_pages(d, 600, num_files=3)
    return d


def _run(capsys, argv):
    rc = job_build.main(argv)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    return rc, out


def test_job_build_single_then_resume(pages_dir, tmp_path, capsys):
    idx = str(tmp_path / "idx")
    rc, out = _run(capsys, [
        "--input", pages_dir, "--index-dir", idx,
        "--partitions", "3", "--smoke-query", "babadi",
    ])
    assert rc == 0 and out["status"] == "ok" and out["mode"] == "single"
    assert out["n_docs"] > 0 and out["smoke_query_hits"] > 0

    # resubmitting the same job resumes from the lineage manifest
    rc2, out2 = _run(capsys, ["--input", pages_dir, "--index-dir", idx,
                              "--partitions", "3"])
    assert rc2 == 0
    assert out2["metrics"]["skipped_extract"] == 3
    assert out2["metrics"]["skipped_postings"] == 3
    assert out2["n_docs"] == out["n_docs"]


def test_job_build_sharded(pages_dir, tmp_path, capsys):
    rc, out = _run(capsys, [
        "--input", pages_dir, "--index-dir", str(tmp_path / "shards"),
        "--num-shards", "2", "--partitions", "2",
        "--smoke-query", "babadi",
    ])
    assert rc == 0 and out["status"] == "ok"
    assert out["shards"] == 2 and out["smoke_query_hits"] > 0


def test_job_build_failure_is_nonzero(tmp_path, capsys):
    rc, out = _run(capsys, ["--input", str(tmp_path / "nope"),
                            "--index-dir", str(tmp_path / "idx2")])
    assert rc == 1 and out["status"] == "error"
