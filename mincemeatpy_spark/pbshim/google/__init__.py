"""Test-environment shim: expose the container's pure-Python protobuf
runtime (shipped publicly inside the preinstalled google-cloud-sdk) as
``google.protobuf`` when no pip-installed protobuf exists.

PySpark 4's generated ``StateMessage_pb2`` (transformWithStateInPandas'
wire protocol to the JVM state server) declares gencode 6.33.0; the SDK
runtime is 6.32.0.  Minor-version gencode-newer-than-runtime is wire-
compatible here (the generated module only uses the stable builder API),
but protobuf's strict version gate rejects it — so after extending the
package path we wrap ``ValidateProtobufRuntimeVersion`` to downgrade
exactly that rejection.  TEST-ONLY: conftest adds this directory to
``sys.path``/``PYTHONPATH`` (driver + Python workers) only when
``google.protobuf`` is otherwise absent.
"""

_SDK_GOOGLE = "/usr/lib/google-cloud-sdk/platform/google_appengine/google"

__path__.append(_SDK_GOOGLE)

import importlib as _importlib

_rv = _importlib.import_module("google.protobuf.runtime_version")
_orig_validate = _rv.ValidateProtobufRuntimeVersion


def _lenient_validate(domain, major, minor, patch, suffix, location):
    try:
        _orig_validate(domain, major, minor, patch, suffix, location)
    except _rv.VersionError:
        # Accept ONLY the documented case: same major, gencode at most
        # one minor ahead of the runtime.  Anything wider (a big minor
        # jump, or runtime-newer rejections) keeps the clear version
        # gate instead of surfacing as opaque wire decode errors.
        if major != _rv.MAJOR or not (0 <= minor - _rv.MINOR <= 1):
            raise


_rv.ValidateProtobufRuntimeVersion = _lenient_validate
