"""iterative_learning_nmpc_tpu — TPU-native quadruped NMPC + iterative imitation learning.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
Atarilab/iterative_learning_NMPC stack (acados/HPIPM/Pinocchio/CasADi/torch),
re-designed TPU-first:

- ``robots``   : robot model catalog (Go2, Solo12) + MJCF generation for the
                 CPU MuJoCo oracle/plant.
- ``models``   : pure-JAX rigid-body dynamics (FK, RNEA, CRBA, centroidal
                 momentum, frame Jacobians) in the Euler-chart the reference
                 uses (base = 6 explicit DOFs, q ∈ R^18, v = dq/dt).
- ``ocp``      : declarative optimal-control problem: stage residuals (costs +
                 penalty constraints), contact activity as masks (static shapes).
- ``solver``   : GN-SQP/RTI trajectory optimizer: vmapped linearization,
                 Riccati backward sweep, parallel line search. Replaces
                 acados+HPIPM+BLASFEO.
- ``ops``      : Pallas TPU kernels for the hot paths (batched Riccati sweep).
- ``gait``     : cyclic gait machines, Raibert / custom / acyclic footstep
                 planners.
- ``mpc``      : closed-loop MPC controller (async replanning, interpolation,
                 delay compensation, RNEA feed-forward + joint PD).
- ``sim``      : CPU MuJoCo co-sim harness (oracle) + batched on-device JAX
                 soft-contact simulator for large-scale datagen.
- ``learning`` : dataset layer, Flax policy, BC training, policy / combined
                 (SafeDAgger) controllers, data-collection and DAgger loops.
- ``parallel`` : device-mesh sharding of batched solves / training (pjit,
                 shard_map, ICI collectives).
"""

__version__ = "0.1.0"

import jax as _jax

# The NMPC numerics (Riccati recursions on 36x36 blocks, RNEA chains) need
# true fp32 accumulation; on TPU the MXU default would silently drop to
# bf16 inputs. "highest" keeps fp32 everywhere; kernels that want bf16
# (policy training matmuls) opt in explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

