"""Backbone pretraining: the reference's fine-tune-from-pretrained
workflow, recovered without network access.

The reference never trains VGG16 from scratch — every recipe seeds it
from the ILSVRC caffemodel (reference train/bounding_box/train.sh:14
``--weights .../VGG16...caffemodel``, train/train.sh:26) and Caffe's
lenient by-name blob matching fine-tunes from there.  This environment
has no egress, so tpufcn reproduces the *workflow* instead of the file:
a short classification pretrain on hardbench-rendered crops (the same
shape x texture conjunction statistics the detection gates test on,
tpufcn/data/hardbench.py) produces an in-repo ``.caffemodel`` whose
layer names are the VGG16 conv-stack names — ``cli train --weights``
and the accuracy gates then consume it through the standard
lenient-by-name converter (tpufcn/convert/convert.py), exactly the
reference's seeding path.

Why it matters (VERDICT round-3 #3): VGG-from-scratch detection sits
near training instabilities on this benchmark — vgg_pyramid diverges at
lr 3e-4 and undertrains at 1e-4 (mAP 0.328 @6k steps), fcn8s has an
order-of-magnitude seed spread.  A pretrained conv stack is the
reference's own fix for exactly this.

TPU notes: the crop bank is rendered once on host (uint8), uploaded
once, and the whole optimization runs as multi-step on-device
``lax.scan`` dispatches — minibatch gather, flip augmentation, demean,
fwd/bwd and adam all on device; the host only fetches the loss curve.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from tpufcn.data.hardbench import (
    CLASS_DEFS, _color_field, distractor_defs, render_object)


def render_cls_dataset(classes: int = 4, n: int = 4096, size: int = 96,
                       seed: int = 7) -> Tuple[np.ndarray, np.ndarray]:
    """Classification crop bank: (images (N, size, size, 3) u8, labels).

    Label space: ``0..classes-1`` the real shape x texture conjunction
    classes, ``classes`` any mismatched (distractor) pairing, and
    ``classes + 1`` pure clutter background — so the features that
    transfer are exactly the ones the detection gates need: texture
    alone or shape alone cannot separate class from distractor.
    """
    rng = np.random.default_rng(seed)
    defs = distractor_defs(classes)
    images = np.empty((n, size, size, 3), np.uint8)
    labels = np.empty((n,), np.int32)
    n_cls = classes + 2
    for i in range(n):
        lab = int(rng.integers(0, n_cls))
        img = _color_field(size, size, rng)
        if lab < classes + 1:
            shape, texture = (CLASS_DEFS[lab] if lab < classes
                              else defs[int(rng.integers(0, len(defs)))])
            # wide scale range so features transfer across the detection
            # benchmark's ~8x object scale spread
            h = int(rng.integers(24, size - 4))
            w = int(rng.integers(24, size - 4))
            x = int(rng.integers(0, size - w))
            y = int(rng.integers(0, size - h))
            patch, msk = render_object(shape, texture, h, w, rng)
            sel = msk > 0
            img[y:y + h, x:x + w][sel] = patch[sel]
        images[i] = img
        labels[i] = lab
    return images, labels


def _build_classifier(classes: int, dtype):
    """VGG16 conv stack + GAP + 1x1 conv head (kept 4-D so the export
    path handles it; the head is dropped by lenient seeding anyway)."""
    import flax.linen as nn
    import jax.numpy as jnp

    from tpufcn.models.layers import conv_relu
    from tpufcn.models.vgg import VGG16Backbone

    class VGG16Classifier(nn.Module):
        num_classes: int
        dtype: Any = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            taps = VGG16Backbone(dtype=self.dtype, name="backbone")(x)
            y = jnp.mean(taps["conv5_3"].astype(jnp.float32),
                         axis=(-3, -2), keepdims=True)
            y = conv_relu(y.astype(self.dtype), self.num_classes, 1,
                          name="fc_cls", relu=False, dtype=self.dtype)
            return y[:, 0, 0, :].astype(jnp.float32)

    return VGG16Classifier(num_classes=classes, dtype=dtype)


def pretrain_vgg16(out_path: str, *, classes: int = 4, steps: int = 1500,
                   batch: int = 128, size: int = 96, n_bank: int = 4096,
                   lr: float = 3e-4, seed: int = 0,
                   steps_per_dispatch: int = 100,
                   log=None) -> Dict[str, float]:
    """Train the VGG16 conv stack as a crop classifier and export it as
    ``out_path`` (.caffemodel).  Returns {"loss", "train_acc", ...}.

    Deterministic for fixed (classes, steps, batch, size, n_bank, lr,
    seed): the bank render and every device-side random draw are seeded.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from tpufcn.convert import export_caffemodel
    from tpufcn.ops.image import demean_bgr

    log = log or (lambda s: None)
    n_cls = classes + 2
    images, labels = render_cls_dataset(classes=classes, n=n_bank,
                                        size=size, seed=7)
    log(f"pretrain: bank {images.shape} rendered")
    bank_x = jnp.asarray(images)
    bank_y = jnp.asarray(labels)

    model = _build_classifier(n_cls, jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.key(seed), jnp.zeros((1, size, size, 3), jnp.float32))
    tx = optax.adam(optax.exponential_decay(lr, max(steps // 2, 1), 0.3,
                                            staircase=True))
    opt_state = tx.init(variables["params"])

    def loss_fn(params, x, y):
        logits = model.apply({"params": params}, x)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        acc = (jnp.argmax(logits, axis=-1) == y).mean()
        return ce.mean(), acc

    @jax.jit
    def run(params, opt_state, key, bx, by):
        def body(carry, _):
            params, opt_state, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            idx = jax.random.randint(k1, (batch,), 0, bx.shape[0])
            x = bx[idx]
            # horizontal-flip augmentation (matches the detection
            # pipeline's flip, data/compositor.py)
            flip = jax.random.bernoulli(k2, 0.5, (batch,))
            x = jnp.where(flip[:, None, None, None], x[:, :, ::-1], x)
            x = demean_bgr(x.astype(jnp.float32))
            (loss, acc), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, x, by[idx])
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), (loss, acc)
        carry, (losses, accs) = jax.lax.scan(
            body, (params, opt_state, key), None,
            length=steps_per_dispatch)
        return carry, losses, accs

    params = variables["params"]
    key = jax.random.key(1000 + seed)
    loss = acc = float("nan")
    done = 0
    while done < steps:
        (params, opt_state, key), losses, accs = run(
            params, opt_state, key, bank_x, bank_y)
        done += steps_per_dispatch
        loss = float(np.asarray(losses[-1]))
        acc = float(np.asarray(accs[-1]))
        log(f"pretrain: step {done}/{steps} loss {loss:.4f} "
            f"acc {acc:.3f}")

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    export_caffemodel({"params": jax.device_get(params)}, out_path)
    return {"loss": round(loss, 4), "train_acc": round(acc, 4),
            "steps": steps, "path": out_path}


def cached_vgg16_pretrain(root: str, *, classes: int = 4,
                          steps: int = 1500, seed: int = 0,
                          size: int = 96, n_bank: int = 4096,
                          lr: float = 3e-4, log=None) -> str:
    """Pretrain once per ``root``+config and reuse the exported
    caffemodel (the gate suite shares one backbone across the VGG
    families, like the reference shares one ILSVRC VGG16.caffemodel
    across recipes).  The cache tag carries every config knob so a
    recipe change can never silently reuse a stale backbone.

    Round-5 calibration: lr is REGIME-CRITICAL — the 8-way 128-144 px
    task trains to acc 1.0 at lr 1e-4 but sits AT CHANCE (acc 0.148,
    loss ln 8) after 4k steps at lr 3e-4 (the VGG-from-scratch
    instability again; BENCH.md round-5 pretrain table)."""
    path = pretrain_cache_path(root, classes=classes, steps=steps,
                               seed=seed, size=size, n_bank=n_bank,
                               lr=lr)
    if os.path.isfile(path):
        return path
    os.makedirs(root, exist_ok=True)
    res = pretrain_vgg16(path, classes=classes, steps=steps, seed=seed,
                         size=size, n_bank=n_bank, lr=lr, log=log)
    if log:
        log(f"pretrain: cached {path} ({res})")
    return path


def pretrain_cache_path(root: str, *, classes: int = 4,
                        steps: int = 1500, seed: int = 0,
                        size: int = 96, n_bank: int = 4096,
                        lr: float = 3e-4) -> str:
    """On-disk location of a cached pretrain (probed by the gate
    scheduler's first-touch cost check, tpufcn/train/gates.py)."""
    return os.path.join(
        root, f"vgg16_hardbench_c{classes}_s{steps}_sz{size}_n{n_bank}"
              f"_lr{lr:g}_seed{seed}.caffemodel")
