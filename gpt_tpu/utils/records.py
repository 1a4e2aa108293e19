"""Experiment run-and-log records (aux subsystem).

Capability parity with the reference's append-to-file experiment logging —
``SDexp`` (``GPT_SGLD_p.jl:135-143``) and the per-run appends of
``PowerPlantNoTensorExperiment.jl:329-333`` accumulated into
``DataRecords.txt`` — upgraded to structured JSON-lines with timestamps and
git revision, so sweeps remain machine-readable.
"""
from __future__ import annotations

import datetime
import json
import os
import subprocess


def _git_rev() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(__file__),
            timeout=5,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _jsonable(v):
    """Coerce a metric value to something json.dumps accepts: scalars via
    float(), array-likes (np/jnp, any size) via .tolist()."""
    if hasattr(v, "tolist"):
        return v.tolist()
    if hasattr(v, "__float__"):
        return float(v)
    return v


def append_record(path: str, experiment: str, metrics: dict, config: dict | None = None) -> dict:
    """Append one JSON line ``{ts, git, experiment, config, metrics}``."""
    rec = {
        "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds"),
        "git": _git_rev(),
        "experiment": experiment,
        "config": config or {},
        "metrics": {k: _jsonable(v) for k, v in metrics.items()},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def read_records(path: str, experiment: str | None = None) -> list[dict]:
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if experiment is None or rec.get("experiment") == experiment:
                out.append(rec)
    return out
