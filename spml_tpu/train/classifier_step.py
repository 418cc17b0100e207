"""Stage-2 softmax-classifier training step (frozen embedding model).

Behavioral reference: pyscripts/train/train_classifier.py:54-189 and
spml/models/predictions/softmax_classifier.py:15-117 in twke18/SPML:
the embedding model runs in eval mode (frozen weights AND frozen BN
statistics), a SoftmaxClassifier head (conv3x3 -> BN -> ReLU ->
Dropout .65 -> conv1x1) over L2-normalized embeddings is trained with
upsampled cross-entropy on pseudo-labels; head LR x10 (weights) / x20
(biases, no wd).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from spml_tpu.models.embeddings import ClassifierHead, build_embedding_model
from spml_tpu.models.spp import resize_bilinear
from spml_tpu.ops import common
from spml_tpu.train import optim
from spml_tpu.train.state import TrainState
from spml_tpu.train.step import _cross_entropy


def build_classifier(config):
    dtype = (jnp.bfloat16 if config.tpu.compute_dtype == "bfloat16"
             else jnp.float32)
    return ClassifierHead(num_classes=config.dataset.num_classes,
                          hidden_dim=config.network.embedding_dim * 2,
                          dropout_rate=0.65, dtype=dtype)


def init_classifier_state(config, rng, emb_dim) -> TrainState:
    from spml_tpu.models.embeddings import INIT_SAMPLE_HW, host_init
    import numpy as np
    cls_model = build_classifier(config)
    h, w = INIT_SAMPLE_HW[0] // 4, INIT_SAMPLE_HW[1] // 4
    cvars = host_init(cls_model, rng,
                      np.zeros((1, h, w, emb_dim), np.float32))
    params = {"prediction": cvars["params"]}
    batch_stats = {"prediction": cvars["batch_stats"]}
    tx = optim.make_optimizer(params, config.train)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params),
                      memory=None, rng=rng)


def make_classifier_train_step(config, emb_model, emb_vars,
                               cls_model=None):
    """Returns train_step(state, batch) -> (state, metrics). The frozen
    embedding variables are closed over (replicated constants)."""
    if cls_model is None:
        cls_model = build_classifier(config)
    C = config.dataset.num_classes
    ignore = config.dataset.semantic_ignore_index
    tx = None
    schedule = optim.make_schedule(config.train)

    def loss_fn(params, batch_stats, batch, rng):
        images = batch["image"]
        # frozen embedding forward, eval mode (train_classifier.py:114-116)
        emb, _ = emb_model.apply(emb_vars, images, train=False)
        emb = jax.lax.stop_gradient(
            common.normalize_embedding(emb.astype(jnp.float32)))
        logits, cls_mut = cls_model.apply(
            {"params": params["prediction"],
             "batch_stats": batch_stats["prediction"]},
            emb, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        logits_up = resize_bilinear(logits,
                                    (images.shape[1], images.shape[2]))
        # compact feed may deliver uint8 labels (driver._to_train_batch)
        labels = batch["semantic_label"].astype(jnp.int32)
        ce = _cross_entropy(logits_up, labels, C, ignore)
        pred = jnp.argmax(logits_up, axis=-1)
        valid = labels < C
        acc = (jnp.sum((pred == labels) & valid)
               / jnp.maximum(jnp.sum(valid), 1))
        return ce, ({"loss": ce, "accuracy": acc},
                    {"prediction": cls_mut["batch_stats"]})

    def train_step(state: TrainState, batch):
        rng, step_rng = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, step_rng)
        nonlocal tx
        if tx is None:
            tx = optim.make_optimizer(state.params, config.train, schedule)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["learning_rate"] = schedule(state.step)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt,
                          memory=state.memory, rng=rng), metrics

    return train_step
