"""Locate a usable ``google.protobuf`` runtime for transformWithStateInPandas.

Spark 4's TWS Python worker speaks protobuf to the JVM state server
(pyspark/sql/streaming/proto/StateMessage_pb2.py). This container ships no
``protobuf`` pip package, but the preinstalled google-cloud-sdk vendors a
pure-Python protobuf 6.32 runtime. Spark's generated pb2 declares gencode
6.33, and protobuf's runtime check refuses any runtime older than the
gencode — a strict-compat guard, not a wire-format issue: 6.32↔6.33 is a
patch-level gap with identical descriptors/serialization (verified by a
StateRequest round-trip in tests). So when (and only when) falling back to
the vendored runtime, the version validation is relaxed to a no-op.

``ensure_protobuf()`` is idempotent and safe to call anywhere; it must run
BEFORE the first StateMessage_pb2 import in a process. The pb2 imports in
pyspark are lazy (inside methods of stateful_processor_api_client), so
importing this module at the top of streaming/tws.py covers both the
driver AND the Python workers — workers unpickle the StatefulProcessor by
reference, which imports streaming.tws, which runs the shim, all before
the first state-server call. The PYTHONPATH export makes the vendor dir
(and the repo itself) visible to worker processes spawned later.
"""

from __future__ import annotations

import os
import sys

_VENDOR_DIRS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _relax_version_check_if_vendored() -> None:
    """Relax the gencode>=runtime refusal when running on a VENDORED
    runtime (6.32) older than Spark's gencode (6.33): patch-level gap,
    wire-compatible. A properly installed protobuf is left untouched.

    The original validator is WRAPPED, not replaced with a no-op
    (round-3 ADVICE): only the known-safe case — same PUBLIC domain,
    same major version as the vendored runtime — is suppressed; a
    cross-major or cross-domain gencode still raises, so a genuinely
    incompatible pb2 module cannot import silently.

    Must run in EVERY process that imports StateMessage_pb2 — including
    workers where google.protobuf imports cleanly via the exported
    PYTHONPATH (so the import-succeeded path needs the patch too)."""
    import google.protobuf

    pkg_file = getattr(google.protobuf, "__file__", "") or ""
    if not any(pkg_file.startswith(d + os.sep) for d in _VENDOR_DIRS):
        return
    from google.protobuf import runtime_version as rv

    if getattr(rv.ValidateProtobufRuntimeVersion, "_lenient_vendored", False):
        return  # already wrapped (idempotent across repeated calls)
    orig = rv.ValidateProtobufRuntimeVersion

    def _lenient(domain, major, minor, patch, suffix, location):
        try:
            orig(domain, major, minor, patch, suffix, location)
        except rv.VersionError:
            # Suppress ONLY the same-major, same-domain minor/patch gap on
            # the vendored runtime (6.33 gencode vs 6.32 runtime).
            if domain != rv.Domain.PUBLIC or major != rv.MAJOR:
                raise

    _lenient._lenient_vendored = True  # type: ignore[attr-defined]
    rv.ValidateProtobufRuntimeVersion = _lenient  # type: ignore[assignment]


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable, returning True on success."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        _relax_version_check_if_vendored()
        return True
    except ImportError:
        pass

    vendor = next((d for d in _VENDOR_DIRS if os.path.isdir(d + "/google/protobuf")), None)
    if vendor is None:
        return False
    if vendor not in sys.path:
        sys.path.append(vendor)
    # Local-mode Python workers inherit the driver's environment — export
    # the vendor dir (for google.protobuf) and the repo root (so workers
    # can import this package when unpickling processors by reference)
    # for sessions created after this call.
    # Each dir is checked and appended INDEPENDENTLY (round-3 ADVICE): an
    # externally-set PYTHONPATH that already holds the vendor dir must not
    # stop the repo root from being exported, and repeated calls must not
    # append duplicates.
    parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
    for d in (vendor, _REPO_ROOT):
        if d not in parts:
            parts.append(d)
    os.environ["PYTHONPATH"] = os.pathsep.join(parts)
    try:
        import google.protobuf.descriptor  # noqa: F401

        _relax_version_check_if_vendored()
        return True
    except ImportError:
        return False
