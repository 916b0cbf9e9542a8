"""Web job-launcher tests (kgforge/web.py vs reference
src/web/web_server.py:53-337): a real HTTP server in a subprocess, a
real POSTed import shelling the pipeline CLI, and a polled completion —
the reference's one remaining entry point, end-to-end."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest

DATA_DIR = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA_DIR, "Mower.xlsx")),
    reason="reference dataset not present",
)


@pytest.fixture(scope="module")
def server():
    proc = subprocess.Popen(
        [sys.executable, "-m", "kgforge.web", "--data-dir", DATA_DIR],
        stdout=subprocess.PIPE,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = proc.stdout.readline()
    port = json.loads(line)["listening"]
    yield f"http://127.0.0.1:{port}"
    proc.terminate()
    proc.wait(timeout=10)


def _get(url: str):
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url: str, payload: dict):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_and_file_listing(server):
    code, health = _get(f"{server}/api/health")
    assert code == 200 and health["status"] == "healthy"
    code, files = _get(f"{server}/api/excel-files")
    assert code == 200
    assert "Mower.xlsx" in files and "Snowmobile.xlsx" in files
    assert files == sorted(files)
    # discovery endpoints degrade to [] with no backing store
    # (reference web_server.py:109-114 / :174-176)
    for ep in ("graphdb-repositories", "neo4j-databases"):
        code, body = _get(f"{server}/api/{ep}")
        assert code == 200 and body == []


def test_import_validation(server):
    # reference web_server.py:188-189 — excelFile required
    code, body = _post(f"{server}/api/import", {})
    assert code == 400 and "required" in body["error"]
    # :209-210 — unknown file is a 404
    code, body = _post(f"{server}/api/import", {"excelFile": "nope.xlsx"})
    assert code == 404
    # path traversal is CLOSED here (documented divergence — the
    # reference joins user input onto DATA_DIR unchecked)
    code, body = _post(f"{server}/api/import", {"excelFile": "../../etc/passwd"})
    assert code == 400 and "escapes" in body["error"]
    # unknown job id
    code, body = _get(f"{server}/api/jobs/job-9999")
    assert code == 404
    # reference validator bounds (src/core/validation.py:295-311)
    code, body = _post(
        f"{server}/api/import", {"excelFile": "Mower.xlsx", "batchSize": 20000}
    )
    assert code == 400 and "max 10000" in body["error"]
    code, body = _post(
        f"{server}/api/import", {"excelFile": "Mower.xlsx", "batchSize": 0}
    )
    assert code == 400 and "positive" in body["error"]
    code, body = _post(
        f"{server}/api/import", {"excelFile": "Mower.xlsx", "batchSize": "abc"}
    )
    assert code == 400 and "integer" in body["error"]


def test_import_job_runs_to_completion(server):
    """POST a real workbook import and poll /api/jobs until the
    pipeline subprocess finishes; the job must surface the pipeline's
    stats block with the Mower goldens (594 parts / 7,912 triples —
    the same pins as test_snowmobile_golden.py's Mower leg)."""
    code, body = _post(f"{server}/api/import", {"excelFile": "Mower.xlsx"})
    assert code == 202 and body["status"] == "running"
    job_id = body["job_id"]

    deadline = time.time() + 280
    job = None
    while time.time() < deadline:
        _, job = _get(f"{server}/api/jobs/{job_id}")
        if job["status"] != "running":
            break
        time.sleep(3)
    assert job is not None and job["status"] == "finished", job
    assert job["success"], job.get("stderr_tail")
    stats = job["stats"]
    assert stats["n_parts"] == 594
    assert stats["total_triples"] == 7912
