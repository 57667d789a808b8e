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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["VerifierCNN", "init_verifier", "train", "verify_scores",
           "detect_and_verify"]

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


def verify_scores(module, params, X, H, batch_size: int = 256) -> np.ndarray:
    """Re-score windows: cnn(X) + H (/root/reference/waldboost/verification.py:103)."""
    X = np.asarray(X, np.float32)
    H = np.asarray(H, np.float32).ravel()
    apply = jax.jit(functools.partial(module.apply, deterministic=True))
    out = []
    for i in range(0, X.shape[0], batch_size):
        xb = jnp.asarray(X[i:i + batch_size])
        out.append(np.asarray(apply(params, xb)))
    scores = np.concatenate(out) if out else np.zeros(0, np.float32)
    return scores + H


def detect_and_verify(image, model, module, params):
    """Run the cascade detector, then re-score each surviving window with the
    CNN verifier.  Returns Boxes with 'scores' (verified) and 'cascade_scores'
    fields.  Functional replacement for the bitrotted reference flow
    (/root/reference/waldboost/verification.py:85-105)."""
    from .samples import gather_samples

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
    samples = model.gather_windows_device(canvas_dev, rs, cs, is_canvas=True)
    verified = verify_scores(module, params, samples, hs)
    lid = level_id_map[rs, cs]
    offs = np.array([(pl.y, pl.x) for pl in packed.levels], np.int64)
    x1 = (cs - offs[lid, 1]).astype(np.float32)
    y1 = (rs - offs[lid, 0]).astype(np.float32)
    rects = np.stack([x1, y1, x1 + n, y1 + m], axis=1) * inv_scales[lid][:, None]
    out = Boxes(rects)
    out.set_field("scores", verified.astype(np.float32))
    out.set_field("cascade_scores", hs.astype(np.float32))
    return out
