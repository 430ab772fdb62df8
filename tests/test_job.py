"""Job-CLI resume semantics (ADVICE r01): the _giants output must not
duplicate on resume, the bucket mapping (hot set + num_buckets) must be
reused from the job manifest, and a num_buckets mismatch must refuse to
resume."""

import json
import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _giants_rows(out_dir):
    gdir = os.path.join(out_dir, "_giants")
    if not os.path.isdir(gdir):
        return 0
    total = 0
    for root, _, files in os.walk(gdir):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


@pytest.fixture(scope="module")
def job_input(tmp_path_factory, synth_table):
    d = tmp_path_factory.mktemp("job_in")
    pq.write_table(synth_table, str(d / "part.parquet"))
    return str(d)


def test_job_giants_resume_no_duplication(tmp_path, job_input, synth_table):
    from job import main

    out = str(tmp_path / "out")
    args = [
        "--input", job_input, "--output", out,
        "--num-buckets", "8", "--split-threshold", "300",
    ]
    main(args)
    g1 = _giants_rows(out)
    assert g1 > 0  # the hot conv (600 turns) went through the split path

    # resume run: giants pass must be skipped (marker in job manifest)
    main(args)
    assert _giants_rows(out) == g1, "resume duplicated the _giants output"

    man = json.load(open(os.path.join(out, "_manifest", "job.json")))
    assert man["giants_done"] is True
    assert len(man["giants"]) == 1

    # total output rows (buckets + giants) == input rows
    total = g1
    for d in os.listdir(out):
        if d.startswith("bucket="):
            total += pq.ParquetFile(
                os.path.join(out, d, "part.parquet")
            ).metadata.num_rows
    assert total == synth_table.num_rows


def test_job_resume_rejects_bucket_mismatch(tmp_path, job_input):
    from job import main

    out = str(tmp_path / "out")
    main(["--input", job_input, "--output", out, "--num-buckets", "8"])
    with pytest.raises(SystemExit):
        main(["--input", job_input, "--output", out, "--num-buckets", "16"])


def test_job_resume_rejects_any_partition_defining_mismatch(
    tmp_path, job_input, tmp_path_factory, synth_table
):
    """ADVICE r02: resume must also refuse a changed --input dir and
    changed hot/split thresholds, not just num_buckets — the persisted
    hot/giant lists were computed from the original corpus."""
    from job import main

    out = str(tmp_path / "out")
    main(["--input", job_input, "--output", out, "--num-buckets", "8",
          "--split-threshold", "300"])

    other_in = tmp_path_factory.mktemp("job_in2")
    pq.write_table(synth_table, str(other_in / "part.parquet"))
    with pytest.raises(SystemExit):
        main(["--input", str(other_in), "--output", out, "--num-buckets", "8",
              "--split-threshold", "300"])
    with pytest.raises(SystemExit):
        main(["--input", job_input, "--output", out, "--num-buckets", "8",
              "--split-threshold", "500"])
    with pytest.raises(SystemExit):
        main(["--input", job_input, "--output", out, "--num-buckets", "8",
              "--split-threshold", "300", "--hot-threshold", "100"])


def test_job_interrupted_giants_rewritten_clean(tmp_path, job_input):
    """A crash after partial _giants files but before the marker must
    lead to a clean rewrite, not an append."""
    from job import main

    out = str(tmp_path / "out")
    args = [
        "--input", job_input, "--output", out,
        "--num-buckets", "8", "--split-threshold", "300",
    ]
    main(args)
    g1 = _giants_rows(out)

    # simulate the crash: giants data present, marker cleared
    man_path = os.path.join(out, "_manifest", "job.json")
    man = json.load(open(man_path))
    man["giants_done"] = False
    json.dump(man, open(man_path, "w"))

    main(args)
    assert _giants_rows(out) == g1
