"""Multi-chip scaling: device meshes and sharded step/render.

The reference is strictly single-GPU/single-queue (SURVEY.md §2: no
DP/TP/PP/SP/EP, one Vulkan queue, boilerplate.rs:646-656).  This engine adds
the scaling story the reference never had, mapped to this domain:

  * data parallel   -> pixels/rays sharded across chips (render)
  * "tensor"/model  -> particle axis sharded across chips (physics)
  * sequence        -> worldline-history (T) axis sharded across chips
                       (the reference's analog of sequence length, SURVEY.md §5)

Sharding is expressed with jax.sharding.NamedSharding under jit (GSPMD): XLA
inserts the all-gathers/permutes/reductions over ICI.  Everything works on a
CPU mesh of virtual devices for testing (tests/test_parallel.py) and is
validated by __graft_entry__.dryrun_multichip.
"""

from . import mesh, sharding
