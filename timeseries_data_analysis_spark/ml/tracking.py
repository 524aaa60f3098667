"""File-based experiment tracking (MLflow-shaped, zero dependencies).

Reference: ``train_models_simple.py:180-650, 935-1002`` logs params,
metrics, model signatures, and figures to MLflow per training run. MLflow
is not installed in this environment, so this module provides the same
contract on plain files — one directory per run holding ``params.json``,
``metrics.jsonl`` (step-wise, append-only), ``tags.json``, and arbitrary
artifacts — with the real ``mlflow`` API used transparently when the
package is importable (same call sites, no code change).

Layout::

    <root>/<experiment>/<run_id>/
        params.json       {"lr": 0.02, ...}           (write-once)
        metrics.jsonl     {"key":"loss","value":...,"step":0}\n...
        tags.json         {"stage": "dev", ...}
        artifacts/        copied files

Runs are reloadable via :func:`load_run`; ``list_runs`` supports the
leaderboard-style comparison the reference's dashboard reads.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

try:  # optional: use the real thing when present
    import mlflow  # type: ignore
    HAS_MLFLOW = True
except ImportError:
    HAS_MLFLOW = False


class Run:
    """One tracked run. Use via ``Tracker.start_run`` (context manager).

    Files are the source of truth (``load_run`` reads them back); when
    the real ``mlflow`` package is importable every call MIRRORS to the
    active mlflow run as well — same call sites, no code change for the
    caller (``test_tracking_optional.py`` exercises the mirroring
    through an injected stand-in module, so the glue stays tested even
    where mlflow is not installed).
    """

    def __init__(self, path: str, run_id: str, mirror: bool = False):
        self.path = path
        self.run_id = run_id
        self._mirror = mirror and HAS_MLFLOW
        os.makedirs(os.path.join(path, "artifacts"), exist_ok=True)

    def log_params(self, params: dict) -> None:
        p = os.path.join(self.path, "params.json")
        merged = {}
        if os.path.exists(p):
            with open(p) as f:
                merged = json.load(f)
        merged.update({k: _jsonable(v) for k, v in params.items()})
        _atomic_write(p, json.dumps(merged, indent=1, sort_keys=True))
        if self._mirror:
            mlflow.log_params({k: _jsonable(v) for k, v in params.items()})

    def log_metrics(self, metrics: dict, step: int | None = None) -> None:
        ts = time.time()
        with open(os.path.join(self.path, "metrics.jsonl"), "a") as f:
            for k, v in metrics.items():
                f.write(json.dumps({"key": k, "value": float(v),
                                    "step": step, "ts": ts}) + "\n")
        if self._mirror:
            mlflow.log_metrics({k: float(v) for k, v in metrics.items()},
                               step=step)

    def set_tags(self, tags: dict) -> None:
        p = os.path.join(self.path, "tags.json")
        merged = {}
        if os.path.exists(p):
            with open(p) as f:
                merged = json.load(f)
        merged.update(tags)
        _atomic_write(p, json.dumps(merged, indent=1, sort_keys=True))
        if self._mirror:
            mlflow.set_tags(dict(tags))

    def log_model_signature(self, name: str, inputs, outputs=None) -> str:
        """Model signature (reference ``train_models_simple.py:360-398``
        logs MLflow signatures per trained model): the input/output
        column schema captured as a JSON artifact. ``inputs``/
        ``outputs`` accept a Spark DataFrame, a ``StructType``, or a
        ``[(name, type)]`` list."""
        def fields(x):
            if x is None:
                return None
            if hasattr(x, "schema"):
                x = x.schema
            if hasattr(x, "fields"):
                return [{"name": f.name, "type": f.dataType.simpleString()}
                        for f in x.fields]
            return [{"name": n, "type": t} for n, t in x]

        sig = {"inputs": fields(inputs), "outputs": fields(outputs)}
        p = os.path.join(self.path, "artifacts", f"signature-{name}.json")
        _atomic_write(p, json.dumps(sig, indent=1))
        if self._mirror:
            mlflow.log_artifact(p)
        return p

    def log_figure(self, fig, name: str) -> str:
        """Persist a figure into the run's artifacts (reference logs
        confusion-matrix/ROC matplotlib figures per run). Duck-typed on
        ``savefig(path)`` so the tracker works — and stays tested —
        without matplotlib installed."""
        p = os.path.join(self.path, "artifacts", name)
        fig.savefig(p)
        if self._mirror:
            try:
                mlflow.log_figure(fig, name)
            except Exception:  # noqa: BLE001 — non-mpl figure object
                mlflow.log_artifact(p)
        return p

    def log_artifact(self, local_path: str, name: str | None = None) -> str:
        if self._mirror:
            mlflow.log_artifact(local_path)
        dst = os.path.join(self.path, "artifacts",
                           name or os.path.basename(local_path))
        if os.path.isdir(local_path):
            shutil.copytree(local_path, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(local_path, dst)
        return dst

    def artifact_dir(self) -> str:
        return os.path.join(self.path, "artifacts")


class Tracker:
    """Experiment root. ``with Tracker(root).start_run("exp") as run: ...``"""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def start_run(self, experiment: str, run_name: str | None = None) -> "_RunCtx":
        run_id = run_name or uuid.uuid4().hex[:12]
        path = os.path.join(self.root, experiment, run_id)
        if os.path.exists(path):
            # A reused run_name must not merge into the prior run's
            # directory (params/tags overwritten, metrics.jsonl
            # appended) — MLflow creates a distinct run; uniquify.
            run_id = f"{run_id}-{uuid.uuid4().hex[:6]}"
            path = os.path.join(self.root, experiment, run_id)
        os.makedirs(path)
        if HAS_MLFLOW:
            mlflow.set_experiment(experiment)
            mlflow.start_run(run_name=run_id)
        run = Run(path, run_id, mirror=True)
        run.set_tags({"start_time": time.time(), "status": "RUNNING"})
        return _RunCtx(run)

    def list_runs(self, experiment: str) -> list[dict]:
        """Run summaries (params + final metric values), newest first."""
        exp_dir = os.path.join(self.root, experiment)
        if not os.path.isdir(exp_dir):
            return []
        out = []
        for run_id in sorted(os.listdir(exp_dir)):
            summary = load_run(os.path.join(exp_dir, run_id))
            summary["run_id"] = run_id
            out.append(summary)
        out.sort(key=lambda r: r.get("tags", {}).get("start_time", 0),
                 reverse=True)
        return out


class _RunCtx:
    def __init__(self, run: Run):
        self.run = run

    def __enter__(self) -> Run:
        return self.run

    def __exit__(self, exc_type, exc, tb) -> None:
        status = "FAILED" if exc_type else "FINISHED"
        self.run.set_tags({"end_time": time.time(), "status": status})
        if self.run._mirror:
            mlflow.end_run(status=status)


def load_run(path: str) -> dict:
    """Reload a persisted run: params, tags, full metric series, and the
    last value per metric key (the leaderboard number)."""
    out: dict = {"params": {}, "tags": {}, "metrics": {}, "metric_series": {}}
    p = os.path.join(path, "params.json")
    if os.path.exists(p):
        with open(p) as f:
            out["params"] = json.load(f)
    t = os.path.join(path, "tags.json")
    if os.path.exists(t):
        with open(t) as f:
            out["tags"] = json.load(f)
    m = os.path.join(path, "metrics.jsonl")
    if os.path.exists(m):
        with open(m) as f:
            for line in f:
                rec = json.loads(line)
                out["metric_series"].setdefault(rec["key"], []).append(
                    (rec["step"], rec["value"]))
                out["metrics"][rec["key"]] = rec["value"]
    return out


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)


def _atomic_write(path: str, content: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(content)
    os.replace(tmp, path)
