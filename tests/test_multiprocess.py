"""Multi-process distributed path: 2 real processes x 4 virtual CPU
devices, exercising jax.distributed.initialize rendezvous, DataLoader host
sharding, and shard_batch's make_array_from_process_local_data branch
(parallel/mesh.py:70) — the TPU-native replacement for the reference's
DDP + DistributedSampler (train_extractor.py:86-91, MVSEC.py:1221-1233).

The workers run a jitted data-parallel loss+grad step on the globally
assembled batch; the scalar results must equal a single-process reference
computation over the same global batch.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"localhost:{{port}}",
                               num_processes=2, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from ei_nexus_tpu.parallel import make_mesh, shard_batch, replicate
    from ei_nexus_tpu.data import DataLoader

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    class DS:
        def __len__(self):
            return 32
        def __getitem__(self, i):
            rng = np.random.default_rng(100 + i)
            return {{"x": rng.normal(size=(16,)).astype(np.float32),
                     "i": np.int32(i)}}

    loader = DataLoader(DS(), batch_size=8, shuffle=True, seed=5,
                        process_index=pid, process_count=2, num_workers=0)
    loader.set_epoch(0)
    batch = next(iter(loader))
    assert batch["x"].shape == (4, 16)   # local shard of the global 8
    mesh = make_mesh()                    # (data=8, model=1) global mesh
    w = replicate(jnp.full((16,), 0.5, jnp.float32), mesh)
    gbatch = shard_batch(batch, mesh)
    assert gbatch["x"].shape == (8, 16)  # globally assembled

    @jax.jit
    def step(w, b):
        loss = jnp.mean(jnp.sum((b["x"] * w) ** 2, -1))
        g = jax.grad(lambda w: jnp.mean(jnp.sum((b["x"] * w) ** 2, -1)))(w)
        return loss, jnp.linalg.norm(g), jnp.sum(b["i"])
    with jax.set_mesh(mesh):
        loss, gnorm, isum = step(w, gbatch)
    print(f"RESULT {{float(loss):.8f}} {{float(gnorm):.8f}} {{int(isum)}}",
          flush=True)
""").format(repo=REPO)


WORKER4 = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]; ckdir = sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"localhost:{{port}}",
                               num_processes=4, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ei_nexus_tpu.parallel import make_mesh, shard_batch, replicate
    from ei_nexus_tpu.data import DataLoader
    from ei_nexus_tpu.train import create_train_state, save_checkpoint

    assert jax.process_count() == 4
    assert len(jax.devices()) == 8

    class DS:
        def __len__(self):
            return 16
        def __getitem__(self, i):
            rng = np.random.default_rng(200 + i)
            return {{"x": rng.normal(size=(16,)).astype(np.float32),
                     "i": np.int32(i)}}

    loader = DataLoader(DS(), batch_size=4, shuffle=True, seed=9,
                        process_index=pid, process_count=4, num_workers=0)
    loader.set_epoch(0)
    batch = next(iter(loader))
    assert batch["x"].shape == (1, 16)   # local shard of the global 4
    # realistic pod topology: model axis INSIDE each process (each host
    # owns one data row of the (data=4, model=2) mesh)
    mesh = make_mesh(data=4, model=2)
    w_np = (np.arange(16 * 8, dtype=np.float32).reshape(16, 8) / 100.0)
    w = jax.make_array_from_callback(
        (16, 8), NamedSharding(mesh, P(None, "model")),
        lambda idx: w_np[idx])
    gbatch = shard_batch(batch, mesh)
    assert gbatch["x"].shape == (4, 16)

    def loss_fn(w, b):
        y = b["x"] @ w          # (4, 8), model-sharded columns
        return jnp.mean(jnp.sum(y ** 2, -1))

    @jax.jit
    def step(w, b):
        loss, g = jax.value_and_grad(loss_fn)(w, b)
        return loss, g, jnp.linalg.norm(g), jnp.sum(b["i"])
    with jax.set_mesh(mesh):
        loss, g, gnorm, isum = step(w, gbatch)
        # one SGD step, then a 4-process sharded checkpoint save
        tx = optax.sgd(0.1)

        class M:  # create_train_state only records model.apply
            apply = staticmethod(lambda *a, **k: None)

        state = create_train_state(M(), {{"params": {{"w": w}}}}, tx)
        grads = {{"w": g}}
        state = state.apply_gradients(grads)
        save_checkpoint(ckdir, state, epoch=1, name="mp4")
    print(f"RESULT {{float(loss):.8f}} {{float(gnorm):.8f}} {{int(isum)}}",
          flush=True)
""").format(repo=REPO)


def test_four_process_data_model_mesh_and_elastic_restore(tmp_path):
    """4 real processes x 2 virtual devices over a (data=4, model=2) mesh
    with a model-sharded parameter, then the checkpoint written by the
    4-process run restored in THIS single process (orbax resharding N=4 ->
    M=1 — the elastic eval-a-pod-checkpoint-on-one-host case)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker4.py"
    script.write_text(WORKER4)
    ckdir = tmp_path / "ckpts"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, str(script), str(i),
                               str(port), str(ckdir)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, env=env, text=True)
             for i in range(4)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=360)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append([ln for ln in out.splitlines()
                     if ln.startswith("RESULT")][0].split()[1:])
    assert all(o == outs[0] for o in outs), outs

    # single-process numpy reference over the same global batch
    idx = np.random.default_rng(9 + 0).permutation(16)[:4]
    x = np.stack([np.random.default_rng(200 + int(i)).normal(
        size=(16,)).astype(np.float32) for i in idx])
    w_np = np.arange(16 * 8, dtype=np.float32).reshape(16, 8) / 100.0
    y = x @ w_np
    loss = float(np.mean(np.sum(y ** 2, -1)))
    g = 2.0 * x.T @ y / len(x)
    np.testing.assert_allclose(float(outs[0][0]), loss, rtol=1e-5)
    np.testing.assert_allclose(float(outs[0][1]), np.linalg.norm(g),
                               rtol=1e-4)
    assert int(outs[0][2]) == int(np.sum(idx))

    # elastic restore: the 4-process sharded save restored here (1 process)
    import optax
    from ei_nexus_tpu.train import create_train_state, restore_checkpoint

    class M:
        apply = staticmethod(lambda *a, **k: None)

    template = create_train_state(
        M(), {"params": {"w": np.zeros((16, 8), np.float32)}},
        optax.sgd(0.1))
    restored, epoch = restore_checkpoint(str(ckdir / "mp4"), template)
    assert epoch == 1
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               w_np - 0.1 * g, rtol=1e-5, atol=1e-6)
    assert int(restored.step) == 1


def test_two_process_data_parallel(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, str(script), str(i),
                               str(port)], stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append([ln for ln in out.splitlines()
                     if ln.startswith("RESULT")][0].split()[1:])

    # both processes observe identical global results
    assert outs[0] == outs[1], outs

    # single-process reference over the same global batch
    rng_perm = np.random.default_rng(5 + 0).permutation(32)[:32]
    idx = rng_perm[: (32 // 8) * 8]
    # process p holds idx[p::2]; device order concatenates p0's shard then
    # p1's (make_array_from_process_local_data contract)
    local0 = idx[0::2][:4]
    local1 = idx[1::2][:4]
    xs, iis = [], []
    for i in np.concatenate([local0, local1]):
        xs.append(np.random.default_rng(100 + int(i)).normal(
            size=(16,)).astype(np.float32))
        iis.append(int(i))
    x = np.stack(xs)
    w = np.full((16,), 0.5, np.float32)
    loss = float(np.mean(np.sum((x * w) ** 2, -1)))
    gnorm = float(np.linalg.norm(np.mean(2 * (x ** 2) * w, axis=0)))
    got_loss, got_gnorm, got_isum = (float(outs[0][0]), float(outs[0][1]),
                                     int(outs[0][2]))
    assert got_isum == sum(iis)
    np.testing.assert_allclose(got_loss, loss, rtol=1e-5)
    np.testing.assert_allclose(got_gnorm, gnorm, rtol=1e-4)
