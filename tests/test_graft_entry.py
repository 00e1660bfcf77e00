"""Driver-contract smoke tests: entry() traces; dryrun_multichip executes."""
import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")


def test_entry_traces():
    """entry()'s fn must trace at the flagship 7B shapes (abstract args: no
    14GB zeros materialization, no compile)."""
    from __graft_entry__ import _build_entry

    fn, args = _build_entry(materialize=False)
    out = jax.eval_shape(fn, *args)
    logits_shape = out[0]
    assert logits_shape.shape == (1, 128, 49958)


@pytest.mark.slow
def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
