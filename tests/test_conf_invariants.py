"""Session-conf leakage invariants (round-6 code-review failure class).

``spark.sql.streaming.stateStore.providerClass`` is session-global and a
checkpoint must be resumed with the provider that WROTE it — a TWS query
earlier in the session flips the conf to RocksDB and a later HDFS-backed
checkpoint read would die (or vice versa).  Save/try/finally-restore
inside a query function is NOT safe here because registered queries
return lazy DataFrames: the conf must still hold when the driver
collects.  The repo's rule is therefore pin-on-every-consumer: every
function that persists a streaming checkpoint across sessions (the
``fixture_stage_dir`` + ``checkpointLocation`` combination) must set the
provider itself, regardless of session history.  This sweep makes the
rule a CI failure instead of a convention.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "mincemeatpy_spark"


def _function_sources():
    """Yield (relpath, funcname, source_segment) for every function def
    in the package."""
    for py in sorted(PKG.rglob("*.py")):
        if "__pycache__" in py.parts:
            continue
        src = py.read_text()
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                seg = ast.get_source_segment(src, node) or ""
                yield str(py.relative_to(PKG)), node.name, seg


def test_cross_session_checkpoint_functions_pin_their_provider():
    offenders = []
    pinned = []
    for rel, name, seg in _function_sources():
        if "fixture_stage_dir" in seg and "checkpointLocation" in seg:
            if "stateStore.providerClass" in seg:
                pinned.append(f"{rel}:{name}")
            else:
                offenders.append(f"{rel}:{name}")
    assert not offenders, (
        "functions persisting a streaming checkpoint across sessions "
        "without pinning stateStore.providerClass (a session-global "
        f"conf leak can corrupt the resume): {offenders}"
    )
    # the sweep must actually be seeing the known consumers — if this
    # shrinks, the sweep's trigger strings rotted, not the code
    assert len(pinned) >= 3, f"sweep lost its known consumers: {pinned}"


def test_no_save_restore_around_lazy_statestore_reads():
    """The statestore READER functions must not wrap the provider pin in
    a restore block: the returned DataFrame is lazy, so restoring before
    return would unset the provider before the scan runs.  Guard the
    shape by asserting the pin is a bare conf.set (no try/finally
    restoring the same key in those functions)."""
    for rel, name, seg in _function_sources():
        if 'format("statestore")' in seg:
            assert "stateStore.providerClass" in seg, (
                f"{rel}:{name} reads the state store without pinning the "
                "provider that wrote the checkpoint"
            )
