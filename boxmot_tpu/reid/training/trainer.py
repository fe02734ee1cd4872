"""ReID trainer: jitted train step, warmup-cosine schedule, EMA, resume.

JAX/optax re-design of the reference ReIDTrainer
(boxmot/reid/training/trainer.py:149-1264): the model + classifier head
train under a combined CE-label-smooth + batch-hard-triplet objective on
P x K identity-balanced batches; learning rate follows linear warmup into
cosine decay; an exponential moving average of the parameters is
maintained; checkpoints carry params / batch stats / optimizer / EMA /
step / sampler seed so runs resume bit-exactly.
"""

from __future__ import annotations

import dataclasses
import pickle
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from boxmot_tpu.reid.datasets import PKSampler, load_dataset, make_batch
from boxmot_tpu.reid.training import losses as L
from boxmot_tpu.reid.training import optim as O

# metric-loss vocabulary: reference recipe names on the left
# (boxmot/configs/training/*.yaml `loss:` key), canonical names accepted
# too; "softmax" = identity loss only, no metric term (reference CLI
# --loss choices, engine/cli.py:857-860)
METRIC_LOSSES = ("triplet", "ms", "multi_similarity", "circle", "softmax")

# identity-loss classifiers (reference --classifier-loss,
# engine/cli.py:861-863): "ce" trains a plain linear head on the
# logits; the margin classifiers train their own normalized weight
# matrix directly on the embeddings (reference losses.py:198-247)
CLASSIFIER_LOSSES = ("ce", "arcface", "cosface")


@dataclasses.dataclass
class TrainConfig:
    model: str = "osnet_x0_25"
    dataset: str = "market1501"
    data_root: str = ""
    crop_hw: tuple = (256, 128)
    p: int = 4  # identities per batch
    k: int = 4  # instances per identity
    steps: int = 1000
    warmup_steps: int = 100
    # epoch-based alternative: when epochs > 0, steps/warmup_steps are
    # derived from the dataset size at trainer construction (the
    # reference trainer is epoch-based; recipes speak epochs)
    epochs: int = 0
    warmup_epochs: int = 0
    base_lr: float = 3.5e-4
    weight_decay: float = 5e-4
    # optimizer profile (reference trainer.py:740-792): '' / -1 resolve
    # by backbone family — ViT-likes get AdamW + clip 1.0 + layer-decay
    # LR, CNNs get Adam (L2-in-grad decay) with no clipping
    optimizer: str = ""
    grad_clip: float = -1.0
    vit_lr_profile: str = "layer_decay"  # layer_decay | reid_lrd | none
    layer_decay: float = 0.95
    # prefix-window LR shaping (reference trainer.py:1699-1735)
    head_warmup_epochs: int = 0
    head_warmup_lr_mult: float = 2.0
    backbone_freeze_epochs: int = 0
    center_lr: float = 0.5  # the center head's own SGD LR
    loss: str = "triplet"  # metric loss: triplet | ms | circle | softmax
    soft_margin: bool = False
    triplet_margin: float = 0.3
    triplet_weight: float = 1.0
    ce_weight: float = 1.0
    label_smooth: float = 0.1
    center_loss_weight: float = 0.0
    # identity classifier (reference trainer.py:689-724): margin
    # classifiers replace the linear head, training on embeddings
    classifier_loss: str = "ce"  # ce | arcface | cosface
    arcface_scale: float = 30.0
    arcface_margin: float = 0.5
    cosface_scale: float = 30.0
    cosface_margin: float = 0.35
    # auxiliary-head CE for part backbones (reference trainer.py:1781-1797):
    # relative weight on the part logits, dropped after a given epoch
    aux_ce_weight: float = 1.0
    aux_ce_drop_epoch: int = 0
    ema_decay: float = 0.999
    # train-time augmentation (reference recipe vocabulary)
    random_erasing: float = 0.5
    color_jitter: bool = False
    gaussian_blur: bool = False
    random_grayscale: float = 0.0
    # ranking eval every N epochs during fit (0 = none; call .evaluate()
    # explicitly — the CLI train command does so at the end)
    eval_interval: int = 0
    flip_tta: bool = False  # average flipped features at eval (reference --flip-tta)
    seed: int = 0
    ckpt_dir: str = ""
    # 0 = single device; N > 1 shards the P*K batch over an N-device mesh
    # (params replicated; XLA inserts the gradient all-reduce, and batch
    # norm statistics reduce globally across shards under SPMD)
    n_devices: int = 0

    def aug_kwargs(self) -> dict:
        return {
            "erase_p": self.random_erasing,
            "color_jitter": self.color_jitter,
            "gaussian_blur": self.gaussian_blur,
            "grayscale_p": self.random_grayscale,
        }


def _build_backbone(name: str) -> nn.Module:
    """Any MODEL_FACTORY backbone is trainable (the reference trainer
    accepts every factory entry, reid/training/trainer.py:634)."""
    from boxmot_tpu.reid.core import MODEL_FACTORY

    if name not in MODEL_FACTORY:
        raise ValueError(
            f"unknown ReID model {name!r}; available: {sorted(MODEL_FACTORY)}"
        )
    return MODEL_FACTORY[name]()


class ReIDClassifier(nn.Module):
    """Backbone + identity head (+ optional center-loss head).

    The second output is the identity-loss input: plain logits for
    ``classifier_loss='ce'``, a tuple of per-part logits when the
    backbone exposes ``part_dims`` (the reference's multi-logit part
    heads, trainer.py:1789-1797), or the margin-classifier loss scalar
    for arcface/cosface (whose normalized weight matrix lives here as
    ``margin_head``, reference losses.py:198-247).
    """

    backbone: nn.Module
    num_classes: int
    center: bool = False
    classifier_loss: str = "ce"
    margin_scale: float = 30.0
    margin_margin: float = 0.5
    part_dims: tuple = ()

    @nn.compact
    def __call__(self, x, targets=None, train: bool = False):
        feats = self.backbone(x, train=train)
        tgt = (
            jnp.zeros((feats.shape[0],), jnp.int32) if targets is None else targets
        )
        if self.classifier_loss == "arcface":
            id_out = L.ArcFaceHead(
                self.num_classes, self.margin_scale, self.margin_margin,
                name="margin_head",
            )(feats, tgt)
        elif self.classifier_loss == "cosface":
            id_out = L.CosFaceHead(
                self.num_classes, self.margin_scale, self.margin_margin,
                name="margin_head",
            )(feats, tgt)
        elif len(self.part_dims) > 1:
            # one classifier per feature segment: global first, then parts
            segs, lo = [], 0
            for d in self.part_dims:
                segs.append(feats[:, lo:lo + d])
                lo += d
            id_out = tuple(
                nn.Dense(self.num_classes, name=f"classifier{i}")(seg)
                for i, seg in enumerate(segs)
            )
        else:
            id_out = nn.Dense(self.num_classes, name="classifier")(feats)
        if self.center:
            center = L.CenterHead(
                self.num_classes, feats.shape[-1], name="center"
            )(feats, tgt)
            return feats, id_out, center
        return feats, id_out


def make_schedule(cfg: TrainConfig):
    return optax.warmup_cosine_decay_schedule(
        init_value=cfg.base_lr / 25,
        peak_value=cfg.base_lr,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.steps, cfg.warmup_steps + 1),
        end_value=cfg.base_lr / 1000,
    )


class ReIDTrainer:
    def __init__(self, cfg: TrainConfig):
        if cfg.loss not in METRIC_LOSSES:
            raise ValueError(
                f"unknown metric loss {cfg.loss!r}; supported: {METRIC_LOSSES}"
            )
        if cfg.classifier_loss not in CLASSIFIER_LOSSES:
            raise ValueError(
                f"unknown classifier loss {cfg.classifier_loss!r}; "
                f"supported: {CLASSIFIER_LOSSES}"
            )
        self.dataset = load_dataset(cfg.dataset, cfg.data_root)
        self.num_classes = self.dataset.num_train_pids
        # reference semantics: one epoch visits every training image
        # once at batch = P*K (reid/training/trainer.py:1072)
        batch = min(cfg.p, self.num_classes) * cfg.k
        spe = max(1, len(self.dataset.train) // batch)
        if cfg.loss in ("ms", "multi_similarity") and cfg.center_loss_weight > 0:
            # MS loss makes the center term redundant (trainer.py:709-711)
            cfg = dataclasses.replace(cfg, center_loss_weight=0.0)
        if cfg.epochs > 0:
            cfg = dataclasses.replace(
                cfg,
                steps=cfg.epochs * spe,
                warmup_steps=cfg.warmup_epochs * spe,
            )
        self.cfg = cfg
        backbone = _build_backbone(cfg.model)
        scale, margin = {
            "ce": (0.0, 0.0),
            "arcface": (cfg.arcface_scale, cfg.arcface_margin),
            "cosface": (cfg.cosface_scale, cfg.cosface_margin),
        }[cfg.classifier_loss]
        self.model = ReIDClassifier(
            backbone=backbone,
            num_classes=self.num_classes,
            center=cfg.center_loss_weight > 0,
            classifier_loss=cfg.classifier_loss,
            margin_scale=scale,
            margin_margin=margin,
            part_dims=tuple(getattr(backbone, "part_dims", ()) or ()),
        )
        self.sampler = PKSampler(self.dataset.train, cfg.p, cfg.k, seed=cfg.seed)
        self.schedule = make_schedule(cfg)

        rng = jax.random.PRNGKey(cfg.seed)
        dummy = jnp.zeros((1, *cfg.crop_hw, 3), jnp.float32)
        variables = self.model.init(rng, dummy, train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})

        opt_name, grad_clip = O.resolve_profile(
            cfg.optimizer, cfg.grad_clip, cfg.model
        )
        self.tx = O.build_tx(
            opt_name, grad_clip, self.schedule, cfg.weight_decay, self.params,
            center_loss_weight=cfg.center_loss_weight, center_lr=cfg.center_lr,
        )
        vit = O.is_vit_model(cfg.model)
        profile = cfg.vit_lr_profile if vit else "none"
        # static per-leaf LR-scale trees; the jitted step selects among
        # them by the freeze/warmup windows (see train_step)
        self._lr_scales = O.lr_scale_tree(self.params, profile, cfg.layer_decay)
        self._window_scales = O.window_scale_trees(
            self.params, cfg.head_warmup_lr_mult
        )
        # head warmup needs a distinguishable head set; CNN profiles have
        # none beyond the classifier, matching the reference's "no separate
        # head parameter group" ignore path (trainer.py:1951-1956)
        self._head_warmup_steps = cfg.head_warmup_epochs * spe if vit else 0
        self._backbone_freeze_steps = cfg.backbone_freeze_epochs * spe
        self._aux_drop_steps = cfg.aux_ce_drop_epoch * spe
        self._spe = spe
        self.best_map = -1.0
        self.opt_state = self.tx.init(self.params)
        self.ema_params = jax.tree.map(jnp.copy, self.params)
        self.step = 0
        self.history = []

        # -- optional data-parallel mesh (SURVEY 2.9: ReID batches are
        # standard data-parallel work; DCN/ICI only carries the grad
        # all-reduce that XLA inserts under jit) --
        self.mesh = None
        self._batch_sharding = None
        if cfg.n_devices and cfg.n_devices > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            devices = jax.devices()[: cfg.n_devices]
            if len(devices) < cfg.n_devices:
                raise ValueError(
                    f"n_devices={cfg.n_devices} but only {len(devices)} present"
                )
            # the sampler clips P to the identities available, so check
            # the effective batch, not the nominal p*k
            batch = min(cfg.p, self.num_classes) * cfg.k
            if batch % cfg.n_devices:
                raise ValueError(
                    f"effective batch {batch} must divide n_devices={cfg.n_devices}"
                )
            self.mesh = Mesh(np.asarray(devices), ("batch",))
            self._batch_sharding = NamedSharding(self.mesh, P("batch"))
            replicated = NamedSharding(self.mesh, P())
            self.params = jax.device_put(self.params, replicated)
            self.batch_stats = jax.device_put(self.batch_stats, replicated)
            self.opt_state = jax.device_put(self.opt_state, replicated)
            self.ema_params = jax.device_put(self.ema_params, replicated)

        cfg_static = cfg
        model = self.model
        tx = self.tx
        lr_scales = self._lr_scales
        freeze_scales, warmup_scales = self._window_scales
        hw_steps = self._head_warmup_steps
        bf_steps = self._backbone_freeze_steps
        aux_drop_steps = self._aux_drop_steps

        @jax.jit
        def train_step(params, batch_stats, opt_state, ema, images, labels, step):
            # prefix windows: backbone freeze wins over head warmup
            # (reference trainer.py:1940-1957); center loss pauses only
            # during head warmup (trainer.py:2012)
            bf_active = step < bf_steps
            hw_active = jnp.logical_and(step < hw_steps, ~bf_active)
            center_w = jnp.where(hw_active, 0.0, cfg_static.center_loss_weight)

            def loss_fn(p):
                out, mutated = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    images,
                    targets=labels,
                    train=True,
                    mutable=["batch_stats"],
                )
                feats, id_out = out[0], out[1]
                if cfg_static.classifier_loss != "ce":
                    ce = id_out  # margin-classifier loss scalar
                elif isinstance(id_out, tuple):
                    # global CE + relatively weighted auxiliary-head CE
                    # (reference trainer.py:1788-1797), aux weight
                    # dropped after aux_ce_drop_epoch (:1586-1590)
                    parts = [
                        L.cross_entropy_label_smooth(
                            lg, labels, cfg_static.label_smooth
                        )
                        for lg in id_out
                    ]
                    aux_w = cfg_static.aux_ce_weight
                    if aux_drop_steps > 0:
                        aux_w = jnp.where(step >= aux_drop_steps, 0.0, aux_w)
                    weighted = parts[0] + aux_w * sum(parts[1:])
                    ce = weighted / (1.0 + aux_w * (len(parts) - 1))
                else:
                    ce = L.cross_entropy_label_smooth(
                        id_out, labels, cfg_static.label_smooth
                    )
                if cfg_static.loss in ("ms", "multi_similarity"):
                    tri = L.multi_similarity_loss(feats, labels)
                elif cfg_static.loss == "circle":
                    tri = L.circle_loss(feats, labels)
                elif cfg_static.loss == "softmax":
                    tri = jnp.zeros(())  # identity loss only
                else:
                    tri = L.triplet_loss(
                        feats,
                        labels,
                        cfg_static.triplet_margin,
                        soft_margin=cfg_static.soft_margin,
                    )
                loss = cfg_static.ce_weight * ce + cfg_static.triplet_weight * tri
                if cfg_static.center_loss_weight > 0:
                    loss = loss + center_w * out[2]
                # norm-only backbones (ViT/LMBN) carry no batch_stats
                return loss, (dict(mutated).get("batch_stats", {}), ce, tri)

            (loss, (new_stats, ce, tri)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            if hw_steps or bf_steps:
                # per-leaf LR windows: freeze -> heads only at base rate
                # (center keeps stepping); warmup -> heads only at
                # base*mult (center grads are zero via center_w); else
                # the static layer-decay scale
                updates = jax.tree.map(
                    lambda u, s, fs, ws: u
                    * jnp.where(bf_active, fs, jnp.where(hw_active, ws, s)),
                    updates, lr_scales, freeze_scales, warmup_scales,
                )
            else:
                updates = jax.tree.map(lambda u, s: u * s, updates, lr_scales)
            new_params = optax.apply_updates(params, updates)
            new_ema = jax.tree.map(
                lambda e, p: cfg_static.ema_decay * e + (1 - cfg_static.ema_decay) * p,
                ema,
                new_params,
            )
            return new_params, new_stats, new_opt, new_ema, loss, ce, tri

        self._train_step = train_step

    # -- checkpointing -------------------------------------------------

    def save_checkpoint(self, path: Path | None = None):
        path = Path(path or Path(self.cfg.ckpt_dir) / f"ckpt_{self.step}.pkl")
        path.parent.mkdir(parents=True, exist_ok=True)
        state = {
            "step": self.step,
            "params": jax.tree.map(np.asarray, self.params),
            "batch_stats": jax.tree.map(np.asarray, self.batch_stats),
            "opt_state": jax.tree.map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x, self.opt_state
            ),
            "ema_params": jax.tree.map(np.asarray, self.ema_params),
            "history": self.history,
            "cfg": dataclasses.asdict(self.cfg),
        }
        with open(path, "wb") as f:
            pickle.dump(state, f)
        return path

    def load_checkpoint(self, path: Path):
        with open(path, "rb") as f:
            state = pickle.load(f)
        self.step = state["step"]
        self.params = jax.tree.map(jnp.asarray, state["params"])
        self.batch_stats = jax.tree.map(jnp.asarray, state["batch_stats"])
        self.opt_state = jax.tree.map(
            lambda ref, x: jnp.asarray(x) if hasattr(ref, "shape") else x,
            self.opt_state,
            state["opt_state"],
        )
        self.ema_params = jax.tree.map(jnp.asarray, state["ema_params"])
        self.history = state["history"]

    # -- training ------------------------------------------------------

    def _next_batch(self):
        # Deterministic per-step RNG so resume reproduces the data stream.
        rng = np.random.default_rng((self.cfg.seed, self.step))
        self.sampler.rng = rng
        idxs = self.sampler.sample_batch()
        return make_batch(
            self.dataset.train, idxs, self.cfg.crop_hw, rng=rng, train=True,
            aug_kwargs=self.cfg.aug_kwargs(),
        )

    def evaluate(self, rerank: bool = False) -> dict:
        """CMC/mAP ranking eval on the dataset's query/gallery with the
        EMA weights (reference runs this every eval_interval epochs,
        trainer.py:887-905)."""
        from boxmot_tpu.reid.training.evaluator import evaluate_reid

        return evaluate_reid(
            self.model.backbone,
            self.backbone_variables(ema=True),
            self.dataset,
            hw=self.cfg.crop_hw,
            rerank=rerank,
            flip_tta=self.cfg.flip_tta,
        )

    def _maybe_eval(self, verbose: bool) -> None:
        res = self.evaluate()
        rec = {"step": self.step, **{k: round(v, 4) for k, v in res.items()}}
        self.history.append(rec)
        if verbose:
            print(rec)
        if res["mAP"] > self.best_map:
            self.best_map = res["mAP"]
            if self.cfg.ckpt_dir:
                # best-so-far snapshot (reference best.pt)
                self.save_checkpoint(Path(self.cfg.ckpt_dir) / "best.pkl")

    def fit(self, steps: int | None = None, log_every: int = 50, verbose: bool = False):
        steps = steps if steps is not None else self.cfg.steps
        eval_every = self.cfg.eval_interval * self._spe
        t0 = time.perf_counter()
        while self.step < steps:
            images, labels = self._next_batch()
            images, labels = jnp.asarray(images), jnp.asarray(labels)
            if self._batch_sharding is not None:
                images = jax.device_put(images, self._batch_sharding)
                labels = jax.device_put(labels, self._batch_sharding)
            (
                self.params,
                self.batch_stats,
                self.opt_state,
                self.ema_params,
                loss,
                ce,
                tri,
            ) = self._train_step(
                self.params,
                self.batch_stats,
                self.opt_state,
                self.ema_params,
                images,
                labels,
                jnp.asarray(self.step, jnp.int32),
            )
            self.step += 1
            if self.step % log_every == 0 or self.step == steps:
                rec = {
                    "step": self.step,
                    "loss": float(loss),
                    "ce": float(ce),
                    "triplet": float(tri),
                    "lr": float(self.schedule(self.step)),
                    "seconds": round(time.perf_counter() - t0, 1),
                }
                self.history.append(rec)
                if verbose:
                    print(rec)
            if eval_every and self.step % eval_every == 0:
                self._maybe_eval(verbose)
        if eval_every and steps % eval_every != 0:
            self._maybe_eval(verbose)  # final epoch not on the interval
        if self.cfg.ckpt_dir:
            self.save_checkpoint()
        return self.history

    # -- inference variables -------------------------------------------

    def backbone_variables(self, ema: bool = True):
        params = self.ema_params if ema else self.params
        return {
            "params": params["backbone"],
            "batch_stats": self.batch_stats.get("backbone", {}),
        }
