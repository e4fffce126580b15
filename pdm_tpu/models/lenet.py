"""LeNet (MLP) classifier + feature head, with a jit-compiled trainer.

Used as the FID feature extractor for MNIST (reference utils/fid.py:31-48)
and trainable fully offline. Capability parity: reference utils/lenet.py
(1024 -> 300 -> 100 -> 10 MLP with ReLU, features() = last hidden layer).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array


class LeNet(nn.Module):
    out_dim: int = 10
    inter_dims: Sequence[int] = (300, 100)

    @nn.compact
    def __call__(self, x: Array, *, features_only: bool = False) -> Array:
        h = x.reshape(x.shape[0], -1)
        for i, dim in enumerate(self.inter_dims):
            h = nn.relu(nn.Dense(dim, name=f"fc_{i}")(h))
        if features_only:
            return h
        return nn.Dense(self.out_dim, name="fc_last")(h)


def train_lenet(
    key: jax.Array,
    images: Array,
    labels: Array,
    eval_images: Array = None,
    eval_labels: Array = None,
    batch_size: int = 64,
    learning_rate: float = 1e-3,
    epochs: int = 10,
    verbose: bool = True,
):
    """Plain Adam + cross-entropy training loop, jit per step.

    Returns (module, params). Parity: reference utils/lenet.py train loops.
    """
    model = LeNet()
    n = images.shape[0]
    params = model.init(key, images[:1])["params"]
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x)
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            acc = jnp.mean(jnp.argmax(logits, -1) == y)
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    @jax.jit
    def evaluate(params, x, y):
        logits = model.apply({"params": params}, x)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        return loss, jnp.mean(jnp.argmax(logits, -1) == y)

    steps_per_epoch = n // batch_size
    for epoch in range(epochs):
        perm = jax.random.permutation(jax.random.fold_in(key, epoch), n)
        tot_loss, tot_acc = 0.0, 0.0
        for i in range(steps_per_epoch):
            idx = perm[i * batch_size : (i + 1) * batch_size]
            params, opt_state, loss, acc = step(
                params, opt_state, images[idx], labels[idx]
            )
            tot_loss += float(loss)
            tot_acc += float(acc)
        if verbose:
            msg = (
                f"epoch {epoch + 1}/{epochs} "
                f"loss {tot_loss / steps_per_epoch:.4f} "
                f"acc {tot_acc / steps_per_epoch:.4f}"
            )
            if eval_images is not None:
                el, ea = evaluate(params, eval_images, eval_labels)
                msg += f" | eval loss {float(el):.4f} acc {float(ea):.4f}"
            print(msg)
    return model, params


def save_lenet(params, path: str) -> None:
    flat = {
        "/".join(map(str, k)): np.asarray(v)
        for k, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    np.savez(path, **flat)


def load_lenet(path: str) -> Tuple[LeNet, dict]:
    import re

    raw = dict(np.load(path))
    params: dict = {}
    for key, val in raw.items():
        parts = [re.sub(r".*?\['(.*?)'\]", r"\1", p) for p in key.split("/")]
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return LeNet(), params
