"""Classifier training loop (reference saber/classifier/trainer.py and
fabric_trainer.py).

One trainer covers both of the reference's implementations: with
``devices=None`` it runs single-chip (trainer.py:15-362); with a device
list it builds a ``Mesh`` and jit-shards the batch over the ``data``
axis — XLA inserts the gradient all-reduce that Lightning Fabric's DDP
wrapper did (fabric_trainer.py:32-38,78-81). Metrics are computed
globally from gathered predictions (all_gather analog,
fabric_trainer.py:248-256 — here a host gather of per-batch outputs).

Recipe parity: FocalLoss(γ=1, α=0.5), AdamW 5e-4 + cosine annealing,
optional EMA, best-macro-F1 checkpointing, ``model_config.yaml`` with
labels + AMG params closing the train→inference loop
(trainer.py:222-230, 319-362).
"""

import os
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from flax import serialization
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from saber_tpu.classifier.losses import (
    classification_metrics,
    focal_loss,
    make_optimizer,
)
from saber_tpu.classifier.models import (SAM2Classifier, SAM3Classifier,
                                         get_classifier_model)

BACKBONE_IMAGE_SIZE = 320  # crops are 320² (reference RandMaskCrop)


class ClassifierTrainer:
    def __init__(self, model_name: str, num_classes: int,
                 sam2_cfg: str = "tiny", sam3_cfg: str = "base",
                 lr: float = 5e-4,
                 num_epochs: int = 100, results_dir: str = "results",
                 devices: Optional[List] = None, use_ema: bool = True,
                 ema_decay: float = 0.999, seed: int = 0,
                 backbone_image_size: int = BACKBONE_IMAGE_SIZE,
                 steps_per_epoch_hint: int = 100):
        self.model_name = model_name
        self.num_classes = num_classes
        self.sam2_cfg = sam2_cfg
        self.sam3_cfg = sam3_cfg
        self.num_epochs = num_epochs
        self.results_dir = results_dir
        self.use_ema = use_ema
        self.ema_decay = ema_decay
        self.backbone_image_size = backbone_image_size

        self.model = get_classifier_model(model_name, num_classes)
        self.is_sam2 = isinstance(self.model, SAM2Classifier)
        self.is_sam3 = isinstance(self.model, SAM3Classifier)
        self.uses_backbone = self.is_sam2 or self.is_sam3
        if self.is_sam2:
            from saber_tpu.models.sam2 import build_sam2
            self.backbone, self.backbone_params = build_sam2(
                sam2_cfg, image_size=backbone_image_size, seed=seed)
        elif self.is_sam3:
            # frozen SAM3 VL backbone (reference classifier/models/SAM3.py:47-66)
            from saber_tpu.models.sam3 import build_sam3
            self.backbone, self.backbone_params = build_sam3(
                sam3_cfg, image_size=backbone_image_size, seed=seed)
        else:
            self.backbone = self.backbone_params = None

        rng = jax.random.PRNGKey(seed)
        dummy = self._dummy_input()
        self.params = self.model.init({"params": rng, "dropout": rng},
                                      *dummy)["params"]
        self.tx = make_optimizer(lr, num_epochs, steps_per_epoch_hint)
        self.opt_state = self.tx.init(self.params)
        self.ema_params = jax.tree.map(jnp.copy, self.params) if use_ema else None

        # device mesh (data-parallel); may span processes (multi-host DCN,
        # the reference's Fabric DDP-over-NCCL analog fabric_trainer.py:32-38)
        self.mesh = None
        self._multiprocess = jax.process_count() > 1
        if devices is not None and len(devices) > 1:
            self.mesh = Mesh(np.array(devices), ("data",))
            if self._multiprocess:
                # params/opt/ema must be GLOBAL arrays before a jit whose
                # in_shardings span non-addressable devices
                self.params = self._put_global(self.params, P())
                self.opt_state = self._put_global(self.opt_state, P())
                if self.ema_params is not None:
                    self.ema_params = self._put_global(self.ema_params, P())
        self._build_steps()

        self.history: Dict[str, List[float]] = {
            "train_loss": [], "val_loss": [], "val_f1": []}
        # {"train"/"val": {"class<k>": {"precision"/"recall"/"f1_score":
        # [per-epoch]}}} — the reference's per-class curve structure
        # (trainer.py:270-308, plotted by plot_per_class_metrics)
        self.per_class_history: Dict[str, Dict[str, Dict[str, List[float]]]] = {
            "train": {f"class{c}": {"precision": [], "recall": [],
                                    "f1_score": []}
                      for c in range(num_classes)},
            "val": {f"class{c}": {"precision": [], "recall": [],
                                  "f1_score": []}
                    for c in range(num_classes)},
        }
        self.best_f1 = -1.0

    # ------------------------------------------------------------------

    def _put_global(self, tree, spec):
        """Place a pytree on the mesh, multi-process aware: each process
        contributes its local rows of a ``P("data")`` batch (or an
        identical full copy for ``P()``), and jax assembles the global
        array — the trainer then runs ONE jitted step over the global
        mesh and XLA's gradient all-reduce rides DCN between hosts
        (reference all-reduce: fabric_trainer.py:78-81)."""
        sh = NamedSharding(self.mesh, spec)
        if self._multiprocess:
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    sh, np.asarray(x)), tree)
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    def _dummy_input(self):
        if self.uses_backbone:
            fs = self.backbone.config.feat_size
            return (jnp.zeros((1, fs, fs, 256)), jnp.zeros((1, fs, fs)))
        return (jnp.zeros((1, 320, 320, 2)),)

    def _embed(self, images: jnp.ndarray) -> jnp.ndarray:
        """Frozen backbone (SAM2/SAM3) features for (B, S, S) grayscale crops — stays on
        device (no numpy detour, unlike reference SAM2.py:130-147). Crops
        resize to the backbone's input size first (the reference's
        set_image_batch resizes to 1024 the same way)."""
        size = self.backbone.config.image_size
        if images.shape[1] != size or images.shape[2] != size:
            images = jax.image.resize(
                images, (images.shape[0], size, size), "bilinear")
        rgb = jnp.repeat(images[..., None], 3, axis=-1)
        bb = self.backbone.apply({"params": self.backbone_params}, rgb,
                                 method=type(self.backbone).encode_image)
        return jax.lax.stop_gradient(bb["vision_features"])

    def _forward(self, params, batch, train: bool, rng):
        if self.uses_backbone:
            embed = batch["embed"]
            fs = embed.shape[1]
            mask_small = jax.image.resize(
                batch["mask"], (batch["mask"].shape[0], fs, fs), "nearest")
            logits = self.model.apply({"params": params}, embed, mask_small,
                                      train=train, rngs={"dropout": rng})
        else:
            x = jnp.stack([batch["image"] * batch["mask"],
                           batch["image"] * (1 - batch["mask"])], axis=-1)
            logits = self.model.apply({"params": params}, x, train=train,
                                      rngs={"dropout": rng})
        return logits

    def _build_steps(self):
        def train_step(params, opt_state, ema_params, batch, rng):
            def loss_fn(p):
                logits = self._forward(p, batch, True, rng)
                return focal_loss(logits, batch["label"]), logits

            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            if ema_params is not None:
                d = self.ema_decay
                ema_params = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                                          ema_params, params)
            preds = jnp.argmax(logits, axis=-1)
            return params, opt_state, ema_params, loss, preds

        def eval_step(params, batch, rng):
            logits = self._forward(params, batch, False, rng)
            return focal_loss(logits, batch["label"]), jnp.argmax(logits, -1)

        if self.mesh is not None:
            rep = NamedSharding(self.mesh, P())
            shard = NamedSharding(self.mesh, P("data"))
            self._train_step = jax.jit(
                train_step,
                in_shardings=(rep, rep, rep, shard, rep),
                out_shardings=(rep, rep, rep, rep, shard))
            self._eval_step = jax.jit(
                eval_step, in_shardings=(rep, shard, rep),
                out_shardings=(rep, shard))
        else:
            self._train_step = jax.jit(train_step)
            self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------

    def _prepare_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        out = {"label": jnp.asarray(batch["label"]),
               "mask": jnp.asarray(batch["mask"])}
        if self.uses_backbone:
            # frozen-backbone features run process-locally (no gradient,
            # no collective needed), then join the global batch
            out["embed"] = self._embed(jnp.asarray(batch["image"]))
        else:
            out["image"] = jnp.asarray(batch["image"])
        if self.mesh is not None and self._multiprocess:
            # each process's loader yields ITS shard of the global batch
            out = self._put_global(out, P("data"))
        return out

    def train(self, train_loader, val_loader=None,
              labels: Optional[Dict[str, str]] = None,
              amg_params: Optional[Dict[str, Any]] = None,
              log_every: int = 0):
        """Full training run. Loaders are callables returning fresh batch
        iterators each epoch (see datasets.batch_iterator)."""
        os.makedirs(self.results_dir, exist_ok=True)
        rng = jax.random.PRNGKey(1234)
        for epoch in range(self.num_epochs):
            losses, ep_preds, ep_labels = [], [], []
            for batch in train_loader():
                rng, sub = jax.random.split(rng)
                if self._multiprocess:
                    # host value (identical on every process) → jit treats
                    # it as the replicated input the sharding expects
                    sub = np.asarray(sub)
                dev_batch = self._prepare_batch(batch)
                (self.params, self.opt_state, self.ema_params, loss,
                 preds) = self._train_step(self.params, self.opt_state,
                                           self.ema_params, dev_batch, sub)
                losses.append(float(loss))
                ep_preds.append(self._local_preds(preds))
                ep_labels.append(np.asarray(batch["label"]).reshape(-1))
            train_loss = float(np.mean(losses)) if losses else 0.0
            self.history["train_loss"].append(train_loss)
            if ep_preds:
                # ONE cross-process gather per epoch (metrics are the only
                # consumer) — not one blocking DCN collective per batch
                gp, gl = self._allgather_pairs(np.concatenate(ep_preds),
                                               np.concatenate(ep_labels))
                tm = classification_metrics(gp, gl, self.num_classes)
                self._record_per_class("train", tm)
                self.history.setdefault("train_f1", []).append(
                    float(tm["macro_f1"]))

            if val_loader is not None:
                metrics = self.evaluate(val_loader)
                self.history["val_loss"].append(metrics["loss"])
                self.history["val_f1"].append(metrics["macro_f1"])
                self._record_per_class("val", metrics)
                if metrics["macro_f1"] > self.best_f1:
                    self.best_f1 = metrics["macro_f1"]
                    self.save(labels=labels, amg_params=amg_params)
                if log_every and epoch % log_every == 0:
                    print(f"epoch {epoch}: train_loss={train_loss:.4f} "
                          f"val_f1={metrics['macro_f1']:.4f}")
            else:
                self.save(labels=labels, amg_params=amg_params)
        self._save_metric_plots()
        return self.history

    def _local_preds(self, preds):
        """Host copy of THIS process's rows of a (possibly cross-process
        sharded) prediction vector, in local-loader order. Shards are
        sorted by global offset, which is the order `_put_global` assigned
        the local loader rows to the local devices."""
        if self._multiprocess and self.mesh is not None:
            shards = preds.addressable_shards
            # _build_steps pins preds to P("data"); a replicated shard
            # (index start None) would make every local device contribute
            # a full copy and silently corrupt epoch metrics — fail loud.
            starts = [s.index[0].start for s in shards]
            assert all(st is not None for st in starts) and (
                len(set(starts)) == len(starts)), (
                "preds out-sharding is not disjoint per device "
                f"(shard starts {starts}); expected P('data')")
            shards = sorted(shards, key=lambda s: s.index[0].start)
            return np.concatenate(
                [np.asarray(s.data).reshape(-1) for s in shards])
        return np.asarray(preds).reshape(-1)

    def _allgather_pairs(self, preds, labels):
        """Epoch-end global concatenation of per-process (preds, labels)
        host arrays — metrics are GLOBAL (reference gathers predictions
        across ranks, fabric_trainer.py:248-256). Both arrays gather in
        process order, so pairing is preserved."""
        if self._multiprocess and self.mesh is not None:
            from jax.experimental import multihost_utils
            return (np.asarray(multihost_utils.process_allgather(
                        preds, tiled=True)).reshape(-1),
                    np.asarray(multihost_utils.process_allgather(
                        labels, tiled=True)).reshape(-1))
        return preds, labels

    def _record_per_class(self, mode: str, metrics: Dict[str, Any]):
        for c in range(self.num_classes):
            h = self.per_class_history[mode][f"class{c}"]
            h["precision"].append(float(metrics["precision"][c]))
            h["recall"].append(float(metrics["recall"][c]))
            h["f1_score"].append(float(metrics["f1"][c]))

    def _save_metric_plots(self):
        """End-of-run plot artifacts (reference trainer.py saves the
        metric + per-class curve figures alongside the checkpoint)."""
        if not self.history["train_loss"]:
            return
        if self._multiprocess and jax.process_index() != 0:
            return  # rank-0 writes, same as save()
        try:
            from saber_tpu.visualization.classifier import (
                plot_all_metrics, plot_per_class_metrics)
            curves = {"train": {"loss": self.history["train_loss"],
                                "macro_f1": self.history.get("train_f1", [])},
                      "val": {"loss": self.history["val_loss"],
                              "macro_f1": self.history["val_f1"]}}
            plot_all_metrics(curves, os.path.join(self.results_dir,
                                                  "metrics.png"))
            plot_per_class_metrics(
                self.per_class_history,
                os.path.join(self.results_dir, "per_class_metrics.png"))
        except Exception:   # plotting is best-effort (headless CI etc.)
            pass

    def evaluate(self, loader) -> Dict[str, Any]:
        rng = jax.random.PRNGKey(0)
        if self._multiprocess:
            rng = np.asarray(rng)
        losses, all_preds, all_labels = [], [], []
        params = self.ema_params if self.use_ema else self.params
        for batch in loader():
            dev_batch = self._prepare_batch(batch)
            loss, preds = self._eval_step(params, dev_batch, rng)
            losses.append(float(loss))
            all_preds.append(self._local_preds(preds))
            all_labels.append(np.asarray(batch["label"]).reshape(-1))
        preds = np.concatenate(all_preds) if all_preds else np.zeros(0, int)
        labels = np.concatenate(all_labels) if all_labels else np.zeros(0, int)
        # one cross-process gather for the whole pass (see _allgather_pairs)
        preds, labels = self._allgather_pairs(preds, labels)
        metrics = classification_metrics(preds, labels, self.num_classes)
        metrics["loss"] = float(np.mean(losses)) if losses else 0.0
        return metrics

    # ------------------------------------------------------------------

    def save(self, labels=None, amg_params=None):
        """best_model weights + model_config.yaml (trainer.py:319-362).

        Multi-process: only process 0 writes — every process computes the
        same global metrics so all agree on WHEN to save, but concurrent
        writers on a shared results_dir would race on the same files (the
        reference's Fabric DDP checkpoints from rank 0 only)."""
        if self._multiprocess and jax.process_index() != 0:
            return
        params = self.ema_params if self.use_ema else self.params
        with open(os.path.join(self.results_dir, "best_model.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(params)))
        config = {
            "model_type": self.model_name,
            "num_classes": self.num_classes,
            "sam2_cfg": self.sam2_cfg,
            "sam3_cfg": self.sam3_cfg,
            "backbone_image_size": self.backbone_image_size,
            "labels": labels or {},
            "amg_params": dict(amg_params or {}, sam2_cfg=self.sam2_cfg),
        }
        with open(os.path.join(self.results_dir, "model_config.yaml"), "w") as f:
            yaml.safe_dump(config, f)


class MeshClassifierTrainer(ClassifierTrainer):
    """Data-parallel trainer over the full device mesh (the reference's
    Lightning-Fabric DDP analog, fabric_trainer.py:11-395)."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("devices", jax.devices())
        super().__init__(*args, **kwargs)
