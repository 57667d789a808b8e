"""CNN post-verification of cascade detections (flax/optax).

Re-architecture of /root/reference/waldboost/verification.py (Keras) in
JAX: a small CNN re-scores detector survivors as

    p(X, H) = sigmoid(cnn(X) + H)

trained with the exponential loss ``exp(-y * (cnn(X) + H))`` clamped to
[1e-6, 1e3] on balanced batches of cascade false/true positives
(/root/reference/waldboost/verification.py:59-81).

The reference module was bitrotted (called the nonexistent
``model.get_bbs``); ``detect_and_verify`` here is functional and uses the
packed-canvas scan so verification runs over the same device pass as
detection.
"""

from __future__ import annotations

import functools
import weakref
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["VerifierCNN", "init_verifier", "train", "verify_scores",
           "VerifierProgram", "detect_and_verify"]

try:
    import flax.linen as nn
    import optax
    _HAVE_FLAX = True
except Exception:  # pragma: no cover
    _HAVE_FLAX = False


if _HAVE_FLAX:

    class VerifierCNN(nn.Module):
        """2x(conv8)+pool+2x(conv16)+dense128 -> scalar adjustment, mirrors
        the reference topology (/root/reference/waldboost/verification.py:28-56)
        with BatchNorm replaced by GroupNorm (stateless, jit/shard friendly —
        a deliberate TPU-native substitution)."""

        @nn.compact
        def __call__(self, x, deterministic: bool = True):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.GroupNorm(num_groups=4)(x)
            x = nn.relu(x)
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.GroupNorm(num_groups=4)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(16, (3, 3), padding="SAME")(x)
            x = nn.GroupNorm(num_groups=4)(x)
            x = nn.relu(x)
            x = nn.Conv(16, (3, 3), padding="SAME")(x)
            x = nn.GroupNorm(num_groups=4)(x)
            x = nn.relu(x)
            x = x.reshape((x.shape[0], -1))
            x = nn.Dropout(0.2, deterministic=deterministic)(x)
            x = nn.Dense(128)(x)
            x = nn.relu(x)
            x = nn.Dropout(0.2, deterministic=deterministic)(x)
            x = nn.Dense(1)(x)
            return x[:, 0]
else:  # pragma: no cover
    VerifierCNN = None


def init_verifier(input_shape: Tuple[int, int, int], seed: int = 0):
    """Create (module, params) for windows of ``input_shape`` (m, n, C)."""
    if not _HAVE_FLAX:
        raise ImportError("flax is required for the CNN verifier")
    module = VerifierCNN()
    params = module.init(jax.random.PRNGKey(seed),
                         jnp.zeros((1,) + tuple(input_shape), jnp.float32))
    return module, params


def exploss(y: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Clamped exponential loss (/root/reference/waldboost/verification.py:59-60)."""
    return jnp.clip(jnp.exp(-y * y_pred), 1e-6, 1e3)


def train(module, params, X0, H0, X1, H1, epochs: int = 10,
          batch_size: int = 64, steps: int = 1000, lr: float = 1e-4,
          seed: int = 0, verbose: bool = True):
    """Balanced-batch training loop
    (/root/reference/waldboost/verification.py:63-81).  Returns trained params.
    """
    if not _HAVE_FLAX:
        raise ImportError("flax is required for the CNN verifier")
    X0 = np.asarray(X0, np.float32)
    X1 = np.asarray(X1, np.float32)
    H0 = np.asarray(H0, np.float32).ravel()
    H1 = np.asarray(H1, np.float32).ravel()
    b = batch_size // 2
    y = jnp.asarray(np.array([-1.0] * b + [1.0] * b, np.float32))
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    rng = np.random.RandomState(seed)
    dropout_key = jax.random.PRNGKey(seed + 1)

    @jax.jit
    def step(params, opt_state, xb, hb, key):
        def loss_fn(p):
            out = module.apply(p, xb, deterministic=False,
                               rngs={"dropout": key})
            return jnp.mean(exploss(y, out + hb))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for e in range(1, epochs + 1):
        losses = []
        for s in range(steps):
            i0 = rng.choice(X0.shape[0], b)
            i1 = rng.choice(X1.shape[0], b)
            xb = jnp.asarray(np.concatenate([X0[i0], X1[i1]]))
            hb = jnp.asarray(np.concatenate([H0[i0], H1[i1]]))
            dropout_key, sub = jax.random.split(dropout_key)
            params, opt_state, loss = step(params, opt_state, xb, hb, sub)
            losses.append(float(loss))
        if verbose:
            print(f"Epoch {e}/{epochs}: loss {np.mean(losses):.6f}")
    return params


class VerifierProgram:
    """Verifier inference as ONE device program.

    ``prog(X, H) -> cnn(X) + H`` in a single jit dispatch over the whole
    (padded) survivor batch — replaces the round-3 host loop that chunked
    256 windows per dispatch (at ~1 ms dispatch latency through the tunnel
    that loop dominated rescoring).  With ``mesh``, the batch dimension is
    sharded over the mesh's data axis (params are closure constants,
    replicated by shard_map).  Callers pad the survivor count to a bucket
    (see :func:`verify_scores`) so jit compiles O(log K) programs.
    """

    def __init__(self, module, params, mesh=None):
        self.module = module
        self.params = params  # strong ref (also keeps the cache key alive)
        self.mesh = mesh
        if mesh is None:
            self._run = jax.jit(self._body)
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from .parallel.mesh import DATA_AXIS

            sharded = shard_map(self._body, mesh=mesh,
                                in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                                out_specs=P(DATA_AXIS), check_vma=False)
            self._run = jax.jit(sharded)

    def _body(self, X, H):
        return self.module.apply(self.params, X, deterministic=True) + H

    def __call__(self, X, H):
        """(K, m, n, C) windows + (K,) cascade scores -> (K,) verified
        scores, one dispatch.  Under a mesh, K must divide the data axis."""
        return self._run(X, H)


_PROGRAMS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def get_verifier_program(module, params, mesh=None) -> VerifierProgram:
    """Memoized :class:`VerifierProgram` per (module, params, mesh) identity
    — repeated serving calls reuse one traced program.  Entries hold strong
    param refs, so ``id`` aliasing cannot produce a stale hit."""
    progs = _PROGRAMS.setdefault(module, [])
    for p, m, prog in progs:
        if p is params and m is mesh:
            return prog
    prog = VerifierProgram(module, params, mesh)
    progs.append((params, mesh, prog))
    return prog


def _pad_bucket(k: int, multiple: int = 1) -> int:
    """Power-of-two survivor-count bucket (min 64), rounded up to
    ``multiple`` (mesh divisibility)."""
    kp = max(64, 1 << (max(k, 1) - 1).bit_length())
    return -(-kp // multiple) * multiple


def verify_scores(module, params, X, H, batch_size: int = 256,
                  mesh=None) -> np.ndarray:
    """Re-score windows: cnn(X) + H (/root/reference/waldboost/verification.py:103).

    One jit dispatch over the bucket-padded survivor set (``batch_size`` is
    kept for API compatibility; chunking no longer happens)."""
    X = np.asarray(X, np.float32)
    H = np.asarray(H, np.float32).ravel()
    k = X.shape[0]
    if k == 0:
        return np.zeros(0, np.float32)
    prog = get_verifier_program(module, params, mesh)
    mult = mesh.devices.size if mesh is not None else 1
    pad = _pad_bucket(k, mult) - k
    Xp = np.pad(X, ((0, pad),) + ((0, 0),) * (X.ndim - 1))
    Hp = np.pad(H, (0, pad))
    return np.asarray(prog(jnp.asarray(Xp), jnp.asarray(Hp)))[:k]


def detect_and_verify(image, model, module, params, mesh=None):
    """Run the cascade detector, then re-score each surviving window with the
    CNN verifier.  Returns Boxes with 'scores' (verified) and 'cascade_scores'
    fields.  Functional replacement for the bitrotted reference flow
    (/root/reference/waldboost/verification.py:85-105).

    The survivor windows never visit the host: the device-resident bucket-
    padded gather feeds the memoized one-dispatch verifier program directly;
    only the (k,) verified scores transfer back."""
    scan = model.scan_packed(image)
    if scan is None:
        from .boxes import Boxes
        return Boxes(np.empty((0, 4), "f"), scores=np.empty(0, "f"))
    canvas_dev, packed, rs, cs, hs = scan
    m, n, _ = model.shape
    level_id_map, inv_scales = packed.level_maps((m, n))
    from .boxes import Boxes
    if rs.size == 0:
        return Boxes(np.empty((0, 4), "f"), scores=np.empty(0, "f"))
    samples_dev, k = model.gather_windows_device(canvas_dev, rs, cs,
                                                 is_canvas=True,
                                                 as_device=True)
    prog = get_verifier_program(module, params, mesh)
    hs_pad = np.zeros(samples_dev.shape[0], np.float32)
    hs_pad[:k] = np.asarray(hs, np.float32).ravel()
    verified = np.asarray(
        prog(samples_dev.astype(jnp.float32), jnp.asarray(hs_pad)))[:k]
    lid = level_id_map[rs, cs]
    offs = np.array([(pl.y, pl.x) for pl in packed.levels], np.int64)
    x1 = (cs - offs[lid, 1]).astype(np.float32)
    y1 = (rs - offs[lid, 0]).astype(np.float32)
    rects = np.stack([x1, y1, x1 + n, y1 + m], axis=1) * inv_scales[lid][:, None]
    out = Boxes(rects)
    out.set_field("scores", verified.astype(np.float32))
    out.set_field("cascade_scores", hs.astype(np.float32))
    return out
