"""The vendored protobuf runtime must be a FALLBACK, never a shadow.

`scopus_spark._vendor.ensure_protobuf()` exists only for containers that
ship no `google.protobuf` wheel (this test env). On a real cluster the
wheel is present and the 17k-line pure-python runtime must stay off
sys.path entirely — it is the slow path for streaming state
serialization. These tests pin that contract.
"""

from __future__ import annotations

import os
import sys
import types

import pytest

from scopus_spark import _vendor
from scopus_spark._vendor import _VENDOR_PB, ensure_protobuf


def _snapshot():
    return (
        list(sys.path),
        os.environ.get("PYTHONPATH"),
        {k: sys.modules[k] for k in list(sys.modules) if k.split(".")[0] == "google"},
    )


def _restore(snap):
    path, pp, mods = snap
    sys.path[:] = path
    if pp is None:
        os.environ.pop("PYTHONPATH", None)
    else:
        os.environ["PYTHONPATH"] = pp
    for k in [k for k in sys.modules if k.split(".")[0] == "google"]:
        del sys.modules[k]
    sys.modules.update(mods)


def test_real_protobuf_wins_over_vendor():
    """When `google.protobuf` is importable (simulated via sys.modules),
    ensure_protobuf must return True WITHOUT touching sys.path or
    PYTHONPATH — the vendor never engages on a machine with the wheel."""
    snap = _snapshot()
    try:
        # strip any previously-armed vendor state so the probe is clean
        sys.path[:] = [p for p in sys.path if p != _VENDOR_PB]
        pp = os.environ.get("PYTHONPATH", "")
        parts = [p for p in pp.split(os.pathsep) if p and p != _VENDOR_PB]
        if parts:
            os.environ["PYTHONPATH"] = os.pathsep.join(parts)
        else:
            os.environ.pop("PYTHONPATH", None)
        # simulate an installed wheel
        fake_google = types.ModuleType("google")
        fake_pb = types.ModuleType("google.protobuf")
        fake_google.protobuf = fake_pb
        sys.modules["google"] = fake_google
        sys.modules["google.protobuf"] = fake_pb

        assert ensure_protobuf() is True
        assert _VENDOR_PB not in sys.path
        assert _VENDOR_PB not in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    finally:
        _restore(snap)


def test_vendor_engages_only_when_wheel_absent():
    """With no importable `google.protobuf` (the real state of this
    container, simulated by purging google.* from sys.modules and the
    vendor dir from sys.path), the fallback arms: vendor dir lands on
    sys.path AND executor PYTHONPATH, and the import then succeeds.

    On a machine where a REAL protobuf wheel is installed, purging
    sys.modules cannot make the package unimportable — ensure_protobuf
    would (correctly) find the wheel and never arm the vendor, so the
    absent-wheel scenario is untestable there and we skip."""
    import importlib.util

    spec = importlib.util.find_spec("google.protobuf")
    if spec is not None and _VENDOR_PB not in (spec.origin or ""):
        pytest.skip("real google.protobuf wheel installed; absence not simulatable")
    snap = _snapshot()
    try:
        for k in [k for k in sys.modules if k.split(".")[0] == "google"]:
            del sys.modules[k]
        sys.path[:] = [p for p in sys.path if p != _VENDOR_PB]
        pp = os.environ.get("PYTHONPATH", "")
        parts = [p for p in pp.split(os.pathsep) if p and p != _VENDOR_PB]
        if parts:
            os.environ["PYTHONPATH"] = os.pathsep.join(parts)
        else:
            os.environ.pop("PYTHONPATH", None)

        assert ensure_protobuf() is True
        assert _VENDOR_PB in sys.path
        assert _VENDOR_PB in os.environ["PYTHONPATH"].split(os.pathsep)
        # the thing it imported really is the vendored runtime
        import google.protobuf as gp

        assert getattr(_vendor, "_VENDOR_PB") in (gp.__file__ or "")
    finally:
        _restore(snap)
