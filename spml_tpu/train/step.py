"""The SPML train step: one jit-compiled SPMD program.

Behavioral reference in twke18/SPML — the whole of
pyscripts/train/train.py:154-293 plus
spml/models/predictions/segsort_softmax.py:103-242:
embedding forward -> per-image vMF k-means -> global prototype gather ->
(CE + SegSort sem_ann) + SetSegSort sem_occ + per-image img_sim losses
-> backward -> custom SGD -> memory-bank FIFO.

TPU re-design (one jit, no DataParallel):
* the global batch is an array sharded over Mesh('data'); XLA inserts
  the all-gathers/all-reduces that replace the reference's
  gather_clustering_and_update_prototypes (models/utils.py:41-131),
  cross-GPU tag gather, loss gather, and SyncBN master/slave traffic;
* k-means cluster assignment runs under stop_gradient (the reference's
  assignments carry no gradient either — argmax indices), so the
  backward pass never revisits the clustering loop;
* prototypes stay fixed-capacity [B, P] with validity masks — see
  spml_tpu/ops/kmeans.py for the equivalence argument.

Loss reduction (train.py:211-219): the reference averages each loss per
GPU then means over GPUs. config.tpu.loss_reduction='per_device_mean'
(default) reproduces that exactly by grouping the global batch into
train.batch_size-image groups; 'global_mean' takes one masked mean over
all pixels (deviation quantified in tests/test_loss_reduction.py).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from spml_tpu.models.embeddings import ClassifierHead, build_embedding_model
from spml_tpu.models.spp import resize_bilinear
from spml_tpu.ops import common, kmeans, knn, losses
from spml_tpu.train import optim
from spml_tpu.train.state import MemoryBank, TrainState


def build_models(config):
    dtype = (jnp.bfloat16 if config.tpu.compute_dtype == "bfloat16"
             else jnp.float32)
    emb_model = build_embedding_model(
        config.network.backbone_types, config.network.embedding_dim,
        dtype=dtype, bn_momentum=1.0 - config.network.bn_momentum,
        remat=(tuple(i in tuple(config.tpu.remat_stages)
                     for i in (2, 3, 4, 5))
               if tuple(config.tpu.remat_stages)
               else config.tpu.remat_backbone))
    cls_model = ClassifierHead(num_classes=config.dataset.num_classes,
                               hidden_dim=config.network.embedding_dim * 2,
                               dropout_rate=0.75, dtype=dtype)
    return emb_model, cls_model


def loc_feature_dim(config) -> int:
    return 5 if "densepose" in config.network.backbone_types else 2


def init_state(config, rng, sample_image) -> TrainState:
    """Initialize parameters, optimizer and memory bank.

    sample_image: [B_global, H, W, 3] — defines the static shapes.
    """
    emb_model, cls_model = build_models(config)
    k1, k2, k3 = jax.random.split(rng, 3)
    from spml_tpu.models.embeddings import INIT_SAMPLE_HW, host_init
    import numpy as np
    ih, iw = INIT_SAMPLE_HW
    evars = host_init(emb_model, k1, np.zeros((1, ih, iw, 3), np.float32))
    dim = config.network.embedding_dim
    cvars = host_init(cls_model, k2,
                      np.zeros((1, ih // 4, iw // 4, dim), np.float32))

    params = {"embedding": evars["params"], "prediction": cvars["params"]}
    batch_stats = {"embedding": evars["batch_stats"],
                   "prediction": cvars["batch_stats"]}
    tx = optim.build_optimizer(params, config.train)
    opt_state = tx.init(params)

    b_global = sample_image.shape[0]
    memory = MemoryBank.create(
        max(config.train.memory_bank_size, 1),
        b_global * config.tpu.segment_capacity,
        dim, loc_feature_dim(config), config.tpu.tag_width)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state,
                      memory=memory, rng=k3)


def _cross_entropy(logits, labels, num_classes, ignore_index,
                   n_groups=1):
    """Softmax CE over non-ignored pixels (labels >= num_classes are
    ignored, segsort_softmax.py:122-131), reduced per group
    (_grouped_masked_mean).

    One-hot multiply-reduce instead of take_along_axis: the minor-dim
    gather over [B,512,512,C] costs ~32 ms/step on v5e (profiled), the
    fused one-hot reduce is bandwidth-bound and ~free.
    """
    valid = labels < num_classes
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    oh = jax.nn.one_hot(safe, num_classes, dtype=logp.dtype)
    nll = -jnp.sum(logp * oh, axis=-1)
    return _grouped_masked_mean(nll, valid, n_groups)


def _grouped_masked_mean(values, mask, n_groups=1):
    """Mean over each group's masked entries, then mean over non-empty
    groups. n_groups=1 == plain masked mean; n_groups=#devices == the
    reference's per-GPU torch.mean + cross-GPU .mean() (train.py:211-219,
    loss.py:51-52 — each GPU averages its own index_select'ed pixels).
    """
    v = values.reshape(n_groups, -1).astype(jnp.float32)
    m = mask.reshape(n_groups, -1).astype(jnp.float32)
    gsum = jnp.sum(v * m, axis=1)
    gcnt = jnp.sum(m, axis=1)
    gmean = gsum / jnp.maximum(gcnt, 1.0)
    has = (gcnt > 0).astype(jnp.float32)
    return jnp.sum(gmean * has) / jnp.maximum(jnp.sum(has), 1.0)


def make_train_step(config, emb_model=None, cls_model=None):
    """Returns train_step(state, batch) -> (state, metrics); jit/shard it
    at the call site."""
    if emb_model is None or cls_model is None:
        emb_model, cls_model = build_models(config)

    C = config.dataset.num_classes
    P = config.tpu.segment_capacity
    ignore = config.dataset.semantic_ignore_index
    n_clusters = tuple(config.network.kmeans_num_clusters)
    km_iters = config.network.kmeans_iterations
    tag_w = config.tpu.tag_width
    mem_size = config.train.memory_bank_size
    tcfg = config.train
    use_sem_ann = tcfg.sem_ann_loss_types != "none"
    use_sem_occ = tcfg.sem_occ_loss_types != "none"
    use_img_sim = tcfg.img_sim_loss_types != "none"
    # feat_aff: the reference constructs the term but its effective
    # objective never invokes it (segsort_softmax_densepose.py:64-68 vs
    # :195-254). tpu.apply_feat_aff=False (default) reproduces that
    # effective objective; True enables the paper-semantics term.
    use_feat_aff = (tcfg.feat_aff_loss_types != "none"
                    and config.tpu.apply_feat_aff)
    densepose = "densepose" in config.network.backbone_types
    # fused-loss kernel operand dtype ('' = float32; bf16 measured
    # perf-neutral on v5e — see TpuConfig.loss_operand_dtype)
    loss_op_dtype = config.tpu.loss_operand_dtype or "float32"
    tx = None  # built lazily against the param tree

    def _n_groups(B):
        """Reduction groups: one per train.batch_size images (the
        reference's per-GPU granularity). Falls back to a single group
        when the global batch isn't a multiple (e.g. ad-hoc tests) or
        under 'global_mean'."""
        bs = tcfg.batch_size
        if (config.tpu.loss_reduction != "per_device_mean"
                or bs <= 0 or B % bs != 0):
            return 1
        return B // bs

    schedule = optim.make_schedule(tcfg)

    def forward_and_losses(params, batch_stats, batch, rng):
        # the compact feed (driver.py::_to_train_batch) uploads labels
        # as uint8 and images in the compute dtype to quarter the
        # host->device bytes; widen labels to int32 here (no-op when a
        # caller feeds int32 directly) so downstream label packing
        # (sem * label_cap + inst) can't overflow
        batch = dict(batch, **{
            k: batch[k].astype(jnp.int32)
            for k in ("semantic_label", "instance_label", "semantic_tag")
            if k in batch})
        images = batch["image"]
        B = images.shape[0]

        (emb, loc), emb_mut = emb_model.apply(
            {"params": params["embedding"],
             "batch_stats": batch_stats["embedding"]},
            images, train=True, mutable=["batch_stats"])

        h, w = emb.shape[1], emb.shape[2]
        N = h * w
        D = emb.shape[-1]

        if config.network.prediction_types == "softmax_classifier":
            # Fully-supervised baseline: CE trains the backbone
            # end-to-end, no clustering / contrastive losses
            # (softmax_classifier.py:50-90 — embeddings NOT detached).
            cls_in = common.normalize_embedding(emb.astype(jnp.float32))
            logits, cls_mut = cls_model.apply(
                {"params": params["prediction"],
                 "batch_stats": batch_stats["prediction"]},
                cls_in, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            logits_up = resize_bilinear(
                logits, (images.shape[1], images.shape[2]))
            ce = _cross_entropy(logits_up, batch["semantic_label"], C,
                                ignore, _n_groups(B))
            pred = jnp.argmax(logits_up, axis=-1)
            valid = batch["semantic_label"] < C
            acc = (jnp.sum((pred == batch["semantic_label"]) & valid)
                   / jnp.maximum(jnp.sum(valid), 1))
            new_stats = {"embedding": emb_mut["batch_stats"],
                         "prediction": cls_mut["batch_stats"]}
            dummy = dict(
                prototype=jnp.zeros((1, D)),
                prototype_with_loc=jnp.zeros(
                    (1, D + loc.shape[-1])),
                semantic_label=jnp.zeros((1,), jnp.int32),
                instance_label=jnp.zeros((1,), jnp.int32),
                batch_index=jnp.zeros((1,), jnp.int32),
                tag=jnp.zeros((1, tag_w), jnp.int32),
                valid=jnp.zeros((1,), bool))
            return ce, ({"sem_ann_loss": ce, "accuracy": acc},
                        new_stats, dummy)

        sem = common.resize_labels(batch["semantic_label"], (h, w))
        inst = common.resize_labels(batch["instance_label"], (h, w))

        # ---- clustering (no gradient through assignments) ----
        segs, _, _ = kmeans.segment_batch(
            jax.lax.stop_gradient(emb), loc, sem, inst,
            n_clusters, P, km_iters, ignore,
            label_cap=config.tpu.label_cap)

        # ---- differentiable pixel embeddings & prototypes ----
        emb_flat = common.normalize_embedding(
            emb.astype(jnp.float32)).reshape(B, N, D)
        loc_flat = loc.reshape(B, N, -1)
        if densepose:
            # densepose variant squeezes embedding magnitude
            # (resnet_pspnet_densepose.py:141-154)
            emb_loc = common.normalize_embedding(
                jnp.concatenate([emb_flat * 0.1, loc_flat], axis=-1))
        else:
            emb_loc = common.normalize_embedding(
                jnp.concatenate([emb_flat, loc_flat], axis=-1))

        weights = segs.pixel_valid.astype(jnp.float32)
        protos = jax.vmap(
            lambda e, s, ww: kmeans.calculate_prototypes_from_labels(
                e, s, P, ww))(emb_flat, segs.pixel_segment_ids, weights)
        protos_loc = jax.vmap(
            lambda e, s, ww: kmeans.calculate_prototypes_from_labels(
                e, s, P, ww))(emb_loc, segs.pixel_segment_ids, weights)

        img_idx = jnp.arange(B, dtype=jnp.int32)
        proto_sem = segs.segment_semantic.reshape(-1)
        proto_inst = segs.segment_instance.reshape(-1)
        proto_batch = jnp.repeat(img_idx, P)
        proto_valid = segs.segment_valid.reshape(-1)
        proto_tag = jnp.repeat(batch["semantic_tag"], P, axis=0)  # [B*P, T]

        cur = dict(prototype=protos.reshape(B * P, D),
                   prototype_with_loc=protos_loc.reshape(B * P, -1),
                   semantic_label=proto_sem, instance_label=proto_inst,
                   batch_index=proto_batch, tag=proto_tag, valid=proto_valid)

        # ---- concat memory bank (stop-gradient snapshots) ----
        memory = batch["memory"]
        if mem_size > 0:
            all_protos = jnp.concatenate(
                [cur["prototype"], memory.prototype.reshape(-1, D)], 0)
            all_sem = jnp.concatenate(
                [proto_sem, memory.semantic_label.reshape(-1)], 0)
            all_valid = jnp.concatenate(
                [proto_valid, memory.valid.reshape(-1)], 0)
            all_tag = jnp.concatenate(
                [proto_tag, memory.tag.reshape(-1, tag_w)], 0)
        else:
            all_protos, all_sem = cur["prototype"], proto_sem
            all_valid, all_tag = proto_valid, proto_tag

        pix_sem = sem.reshape(-1)
        pix_own = (segs.pixel_segment_ids
                   + img_idx[:, None] * P).reshape(-1)
        pix_valid = segs.pixel_valid.reshape(-1)
        pix_tag = jnp.repeat(batch["semantic_tag"], N, axis=0)

        metrics = {}
        total = 0.0

        # ---- semantic annotation: CE + SegSort ----
        cls_in = jax.lax.stop_gradient(
            common.normalize_embedding(emb.astype(jnp.float32)))
        logits, cls_mut = cls_model.apply(
            {"params": params["prediction"],
             "batch_stats": batch_stats["prediction"]},
            cls_in, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        logits_up = resize_bilinear(
            logits, (images.shape[1], images.shape[2]))
        ce = _cross_entropy(logits_up, batch["semantic_label"], C, ignore,
                            _n_groups(B))

        # ---- semantic co-occurrence tags ----
        # VOC: dataset-level multi-hot tags (segsort_softmax.py:146-151).
        # DensePose: per-prototype tags propagated from the nearest
        # labeled segment within the same image over prototypes_with_loc
        # (segsort_softmax_densepose.py:174-193; top-1, threshold .95,
        # tagless prototypes fall back to all-ones = unconstrained).
        if densepose and (use_sem_occ or use_feat_aff):
            if mem_size > 0:
                all_ploc = jnp.concatenate(
                    [cur["prototype_with_loc"],
                     memory.prototype_with_loc.reshape(
                         -1, cur["prototype_with_loc"].shape[-1])], 0)
                all_pbatch = jnp.concatenate(
                    [proto_batch, memory.batch_index.reshape(-1)], 0)
            else:
                all_ploc, all_pbatch = cur["prototype_with_loc"], proto_batch
            nn_tags = knn.nearest_neighbor_multiset_labels(
                jax.lax.stop_gradient(all_ploc),
                jax.lax.stop_gradient(all_ploc),
                all_sem, all_pbatch, all_pbatch, C,
                top_k=1, threshold=0.95, prototype_mask=all_valid)
            tagless = jnp.max(nn_tags, axis=1, keepdims=True) == 0
            nn_tags = jnp.where(tagless, 1, nn_tags)
            occ_proto_tags = nn_tags
            occ_pix_tags = jnp.take(nn_tags, pix_own, axis=0)
        else:
            occ_proto_tags = all_tag[:, 1:C]
            occ_pix_tags = pix_tag[:, 1:C]

        # ---- sem_ann (CE + SegSort) and sem_occ losses ----
        ann_pix_mask = pix_valid & (pix_sem < C)
        ann_proto_mask = all_valid & (all_sem < C)
        ann = None
        occ = None
        if (config.tpu.use_fused_loss and use_sem_ann and use_sem_occ):
            # one fused sweep computes both losses' statistics (the two
            # losses share the same pixel/prototype pairs)
            from spml_tpu.ops.pallas.segsort_loss import fused_joint_losses
            ann_ll, occ_ll = fused_joint_losses(
                emb_flat.reshape(-1, D), pix_sem, pix_own, occ_pix_tags,
                all_protos, jnp.where(ann_proto_mask, all_sem, -1),
                occ_proto_tags, tcfg.sem_ann_concentration,
                tcfg.sem_occ_concentration, ann_pix_mask, pix_valid,
                all_valid, reduction="none",
                operand_dtype=loss_op_dtype)
            ann = _grouped_masked_mean(ann_ll, ann_pix_mask, _n_groups(B))
            occ = _grouped_masked_mean(occ_ll, pix_valid, _n_groups(B))
        else:
            if use_sem_ann:
                if config.tpu.use_fused_loss:
                    from spml_tpu.ops.pallas.segsort_loss import \
                        fused_segsort_loss
                    ann_ll = fused_segsort_loss(
                        emb_flat.reshape(-1, D), pix_sem, pix_own,
                        all_protos,
                        jnp.where(ann_proto_mask, all_sem, -1),
                        tcfg.sem_ann_concentration, ann_pix_mask,
                        ann_proto_mask, reduction="none",
                        operand_dtype=loss_op_dtype)
                    ann = _grouped_masked_mean(ann_ll, ann_pix_mask,
                                               _n_groups(B))
                else:
                    ann_ll = losses.segsort_loss(
                        emb_flat.reshape(-1, D), pix_sem, pix_own,
                        all_protos, all_sem, tcfg.sem_ann_concentration,
                        ann_pix_mask, ann_proto_mask, reduction="none")
                    ann = _grouped_masked_mean(ann_ll, ann_pix_mask,
                                               _n_groups(B))
            if use_sem_occ:
                if config.tpu.use_fused_loss:
                    from spml_tpu.ops.pallas.segsort_loss import \
                        fused_set_segsort_loss
                    occ_ll = fused_set_segsort_loss(
                        emb_flat.reshape(-1, D), occ_pix_tags, pix_own,
                        all_protos, occ_proto_tags,
                        tcfg.sem_occ_concentration, pix_valid, all_valid,
                        reduction="none", operand_dtype=loss_op_dtype)
                    occ = _grouped_masked_mean(occ_ll, pix_valid,
                                               _n_groups(B))
                else:
                    occ_ll = losses.set_segsort_loss(
                        emb_flat.reshape(-1, D), occ_pix_tags, pix_own,
                        all_protos, occ_proto_tags,
                        tcfg.sem_occ_concentration, pix_valid, all_valid,
                        reduction="none")
                    occ = _grouped_masked_mean(occ_ll, pix_valid,
                                               _n_groups(B))

        sem_ann = (ce + ann) * tcfg.sem_ann_loss_weight \
            if ann is not None else ce
        metrics["sem_ann_loss"] = sem_ann
        total = total + sem_ann
        if occ is not None:
            occ = occ * tcfg.sem_occ_loss_weight
            metrics["sem_occ_loss"] = occ
            total = total + occ

        # ---- low-level image similarity (per image) ----
        # VOC groups by embeddings ++ location (segsort_softmax.py:222);
        # the densepose predictor uses the plain embeddings
        # (segsort_softmax_densepose.py:236).
        if use_img_sim:
            def one_image(e, il, own, pl, p_inst, p_valid, p_mask):
                return losses.segsort_loss(
                    e, il, own, pl, p_inst,
                    tcfg.img_sim_concentration, p_mask, p_valid)

            sim_emb = emb_flat if densepose else emb_loc
            sim_protos = protos if densepose else protos_loc
            per_img = jax.vmap(one_image)(
                sim_emb, inst.reshape(B, N), segs.pixel_segment_ids,
                sim_protos, segs.segment_instance, segs.segment_valid,
                segs.pixel_valid)
            has_any = jnp.any(segs.pixel_valid, axis=-1)
            img_sim = _grouped_masked_mean(per_img, has_any, _n_groups(B))
            img_sim = img_sim * tcfg.img_sim_loss_weight
            metrics["img_sim_loss"] = img_sim
            total = total + img_sim

        # ---- feature affinity ----
        # NOTE: the reference CONSTRUCTS feat_aff_loss in every predictor
        # (segsort_softmax*.py:61-68) but never invokes it — the shipped
        # DensePose config's "aff 12 / 0.5" is dead code there, so
        # use_feat_aff is additionally gated on tpu.apply_feat_aff
        # (default False == the reference's effective objective). When
        # enabled we implement the paper/config semantics: the
        # NN-propagated tag set-loss at feat_aff concentration/weight.
        if use_feat_aff and densepose:
            aff_ll = losses.set_segsort_loss(
                emb_flat.reshape(-1, D), occ_pix_tags, pix_own,
                all_protos, occ_proto_tags, tcfg.feat_aff_concentration,
                pix_valid, all_valid, reduction="none")
            aff = _grouped_masked_mean(aff_ll, pix_valid, _n_groups(B))
            aff = aff * tcfg.feat_aff_loss_weight
            metrics["feat_aff_loss"] = aff
            total = total + aff

        # ---- top-5 prototype retrieval accuracy ----
        # costs ~6.7 ms/step at flagship scale (5.5% of the step). The
        # reference computes it every step but only LOGS it every
        # tensorboard_step (train.py:222-258), so computing it exactly
        # on the logged steps is observably identical; train_step sets
        # batch["compute_metrics"] accordingly (tpu.lazy_metrics).
        def _acc(_):
            a, _r = knn.top_k_ranking(all_protos, all_sem, all_protos,
                                      all_sem, 5, all_valid, all_valid)
            return a
        flag = batch.get("compute_metrics", None)
        if flag is None or not config.tpu.lazy_metrics:
            acc = _acc(None)
        else:
            acc = jax.lax.cond(flag, _acc,
                               lambda _: jnp.zeros((), jnp.float32),
                               None)
        metrics["accuracy"] = jax.lax.stop_gradient(acc)
        metrics["num_segments"] = jnp.sum(proto_valid.astype(jnp.int32))

        new_stats = {"embedding": emb_mut["batch_stats"],
                     "prediction": cls_mut["batch_stats"]}
        return total, (metrics, new_stats, cur)

    def train_step(state: TrainState, batch) -> tuple[TrainState, dict]:
        rng, step_rng = jax.random.split(state.rng)
        batch = dict(batch, memory=state.memory,
                     compute_metrics=(
                         state.step % tcfg.tensorboard_step == 0))
        grad_fn = jax.value_and_grad(forward_and_losses, has_aux=True)
        (total, (metrics, new_stats, cur)), grads = grad_fn(
            state.params, state.batch_stats, batch, step_rng)

        nonlocal tx
        if tx is None:
            tx = optim.build_optimizer(state.params, tcfg, schedule)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        b_global = batch["image"].shape[0]
        if config.network.prediction_types == "softmax_classifier":
            new_memory = state.memory  # no prototypes in baseline mode
        else:
            new_memory = state.memory.push(
                jax.lax.stop_gradient(cur["prototype"]),
                jax.lax.stop_gradient(cur["prototype_with_loc"]),
                cur["semantic_label"], cur["instance_label"],
                cur["batch_index"], cur["tag"], cur["valid"], b_global)

        metrics["loss"] = total
        metrics["learning_rate"] = schedule(state.step)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt,
                               memory=new_memory, rng=rng)
        return new_state, metrics

    # exposed for gradient-level parity tests (tests/, lockstep_parity)
    train_step.forward_and_losses = forward_and_losses
    return train_step
