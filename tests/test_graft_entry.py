"""Driver entry-point gate: dryrun_multichip must self-configure a virtual
CPU mesh (the image's sitecustomize force-sets jax_platforms='axon,cpu' via
jax.config in EVERY interpreter, so env vars alone are not enough)."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_cpu_mesh_ready_logic():
    # pytest env: CPU backend live with 8 virtual devices
    assert graft._cpu_mesh_ready(8) is True
    assert graft._cpu_mesh_ready(4) is True
    # more devices than this process has -> must re-exec in a subprocess
    assert graft._cpu_mesh_ready(9) is False


@pytest.mark.slow
def test_dryrun_multichip_inline(capsys):
    """Full dp + dp-x-tp dryrun on the harness's own 8-device CPU mesh."""
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dp: OK" in out
    assert "dp x tp (2-D mesh): OK" in out
