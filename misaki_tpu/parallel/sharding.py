"""Multi-chip scaling: shard the (pixels x spp) wavefront over a device mesh
(SURVEY.md section 2.6 / 5: the reference's only parallelism is TBB tiles on
one CPU; the TPU-native equivalent is `shard_map` over ICI with psum'd film
and parameter gradients).

Design:
  * scene + BVH are replicated on every device (they are small relative to
    HBM; the wavefront dominates);
  * the global lane space [0, W*H*spp) is split contiguously per device;
    each device renders its lanes and splats into a local film copy;
  * films are `psum` reduced — exact, because splatting is additive;
  * in the backward pass, AD transposes the replicated-parameter broadcast
    into a gradient psum automatically (the all-reduce the reference never
    had).
Determinism: lane seeding is global (driver.make_rng), so the image is
bit-identical for any device count modulo float-add ordering in the psum.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from misaki_tpu.render import film as film_mod
from misaki_tpu.render.driver import _render_chunk


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-host (DCN) initialization — `jax.distributed.initialize` with
    explicit coordination parameters, or fully automatic discovery on cloud
    TPU pods (SURVEY.md section 2.6: the reference has no multi-host story;
    here every host runs the same SPMD program and the film psum rides ICI
    within a slice / DCN across slices).

    Safe to call on a single host: a no-op when num_processes == 1."""
    if num_processes in (None, 1) and coordinator is None:
        return  # single-process run: nothing to coordinate
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_host_chip_mesh(axis_names=("host", "chip")):
    """2D (host, chip) mesh over all global devices: shard the wavefront
    over `chip` (ICI collectives) and the spp/image dimension over `host`
    (DCN). Single-host runs degenerate to (1, n_local) and behave exactly
    like the 1D mesh."""
    import jax

    devices = np.asarray(jax.devices())
    n_hosts = max(getattr(jax, "process_count", lambda: 1)(), 1)
    per_host = len(devices) // n_hosts
    return Mesh(devices.reshape(n_hosts, per_host), axis_names)


def make_mesh(n_devices, axis_name="wavefront"):
    """1D mesh over the first n devices. Falls back to the (virtual) CPU
    backend when the default platform has too few devices — this box exposes
    exactly one tunneled TPU chip, and the ambient axon plugin prepends
    itself to jax_platforms, so `--xla_force_host_platform_device_count=N`
    meshes live on the "cpu" backend even when a TPU is visible."""
    devices = jax.devices()
    if len(devices) < n_devices:
        devices = jax.devices("cpu")
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)}"
    )
    return Mesh(np.asarray(devices[:n_devices]), (axis_name,))


def render_sharded(mesh, scene, seed=0, depth_cap=8, axis_name="wavefront"):
    """Forward sharded render -> full film (replicated)."""
    W, H, spp = scene.film_width, scene.film_height, scene.spp
    n_total = W * H * spp
    n_dev = mesh.devices.size
    # spp-aligned per-device lane block (dense pixel-major splat requirement)
    lanes_per_dev = -(-(-(-n_total // n_dev)) // spp) * spp
    lane0s = jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(lanes_per_dev)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(),
        # The integrator's fori_loop carries start as replicated constants
        # (throughput = ones) and become device-varying after one bounce;
        # the vma type check rejects that even though the program is correct
        # (every lane's carry is derived from its own sharded rays). Skip it.
        check_vma=False,
    )
    def shard_fn(scene, lane0_block):
        film_flat = film_mod.new_film_flat(
            H, W, 5, scene.filter_type, scene.filter_stddev
        )
        film_flat = _render_chunk(
            scene, film_flat, lane0_block[0], n_total, jnp.uint32(seed),
            chunk=lanes_per_dev, depth_cap=depth_cap,
        )
        return jax.lax.psum(film_flat, axis_name)

    film_flat = shard_fn(scene, lane0s)
    return film_mod.film_from_flat(
        film_flat, H, W, scene.filter_type, scene.filter_stddev
    )


DEFAULT_TRAIN_LEAVES = ("materials", "rad_coeff", "rad_curve")


def render_sharded_2d(mesh, scene, seed=0, depth_cap=8,
                      axis_names=("host", "chip")):
    """Forward render over a 2D (host, chip) mesh (make_host_chip_mesh):
    lanes are split host-major then chip-minor — the flattened split is
    identical to the 1D mesh's, so images match bit-for-bit modulo psum
    ordering; the film reduction psums over `chip` (ICI) first, then `host`
    (DCN). Smoke-testable on the virtual CPU mesh (tests/conftest.py)."""
    W, H, spp = scene.film_width, scene.film_height, scene.spp
    n_total = W * H * spp
    n_host, n_chip = mesh.devices.shape
    n_dev = n_host * n_chip
    lanes_per_dev = -(-(-(-n_total // n_dev)) // spp) * spp
    lane0s = (jnp.arange(n_dev, dtype=jnp.uint32)
              .reshape(n_host, n_chip) * jnp.uint32(lanes_per_dev))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(*axis_names)),
        out_specs=P(),
        check_vma=False,  # see render_sharded
    )
    def shard_fn(scene, lane0_block):
        film_flat = film_mod.new_film_flat(
            H, W, 5, scene.filter_type, scene.filter_stddev
        )
        film_flat = _render_chunk(
            scene, film_flat, lane0_block[0, 0], n_total, jnp.uint32(seed),
            chunk=lanes_per_dev, depth_cap=depth_cap,
        )
        film_flat = jax.lax.psum(film_flat, axis_names[1])  # ICI first
        return jax.lax.psum(film_flat, axis_names[0])       # then DCN

    film_flat = shard_fn(scene, lane0s)
    return film_mod.film_from_flat(
        film_flat, H, W, scene.filter_type, scene.filter_stddev
    )


def train_step_sharded(mesh, scene, target_rgb, seed=0, depth_cap=4,
                       axis_name="wavefront", leaves=DEFAULT_TRAIN_LEAVES):
    """One differentiable training step: sharded render -> L2 image loss ->
    gradients w.r.t. the requested differentiable parameter leaves
    (misaki_tpu.diff.DIFF_LEAVES: packed material columns, emitter radiance
    coeffs/curves, envmap texels, medium sigma amplitudes/scales).

    The scene is flipped into diff_mode so microfacet alpha participates via
    the detached-sampling estimator (see misaki_tpu/diff/__init__.py)."""
    from misaki_tpu.diff import get_leaves, replace_leaves

    target = jnp.asarray(target_rgb)
    scene_d = scene.replace(diff_mode=True)

    def loss_fn(values):
        scene2 = replace_leaves(scene_d, values)
        film = render_sharded(mesh, scene2, seed, depth_cap, axis_name)
        rgb, _ = film_mod.develop(film)
        return jnp.mean((rgb - target) ** 2)

    # jit the whole value_and_grad: without it JAX executes the forward and
    # backward op-by-op eagerly (hundreds of per-op compiles).
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
        get_leaves(scene_d, leaves)
    )
    return loss, grads
