"""scripts/tp_audit.py: the TP quantification must hold as code changes.

Pins the headline claims of docs/TENSOR_PARALLEL.md: tensor_parallel_specs
shards essentially ALL state bytes (only scalar/tiny leaves replicate) and
the per-device split is the ideal 1/tp.
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts")
)


@pytest.mark.parametrize("tp", [2, 4])
def test_sultani_audit_ideal_split(tp):
    os.environ["_TP_AUDIT_BOOTSTRAPPED"] = "1"  # conftest already forced CPU
    import tp_audit

    rep = tp_audit.audit_family("sultani", tp)
    assert rep["sharded_bytes_frac"] >= 0.999
    assert abs(rep["memory_vs_replicated"] - 1.0 / tp) < 1e-3
    assert rep["per_device_mib"] < rep["total_mib"] / tp + 0.01
    # the replicated remainder is scalar biases only
    for leaf in rep["largest_replicated"]:
        assert leaf["kib"] < 1.0, leaf
