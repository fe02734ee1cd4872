"""CLIP-ReID stage-1 prompt learning on TPU.

The reference's first training stage freezes the image encoder,
extracts one feature per training image, and optimizes per-identity
text context vectors against them with a symmetric supervised
contrastive loss (boxmot/reid/backbones/clip/make_model_clipreid.py:
117-190 + PromptLearner).  Here the whole stage is one jitted scan over
shuffled mini-batches of the precomputed image features: features stay
resident on device, each step is a text-transformer forward/backward —
pure MXU work with static shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from boxmot_tpu.models.clip_reid import (
    ClipTextEncoder,
    PromptLearner,
    clip_prompt_losses,
)


@dataclasses.dataclass
class PromptStageConfig:
    num_classes: int
    feat_dim: int = 512
    width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    n_cls_ctx: int = 4
    batch: int = 64
    steps: int = 200
    lr: float = 3.5e-4
    temperature: float = 0.07
    seed: int = 0


class PromptStage:
    """Bundles PromptLearner + ClipTextEncoder for stage-1 training."""

    def __init__(
        self,
        cfg: PromptStageConfig,
        n_prefix: int = 5,
        n_suffix: int = 2,
        text_context: int | None = None,
    ):
        self.cfg = cfg
        self.prompt = PromptLearner(
            num_classes=cfg.num_classes,
            width=cfg.width,
            n_cls_ctx=cfg.n_cls_ctx,
            n_prefix=n_prefix,
            n_suffix=n_suffix,
        )
        self.text = ClipTextEncoder(
            width=cfg.width,
            layers=cfg.text_layers,
            heads=cfg.text_heads,
            context=text_context or self.prompt.seq_len,
            proj_dim=cfg.feat_dim,
        )

    def init(self, rng):
        dummy = jnp.zeros((1,), jnp.int32)
        p_vars = self.prompt.init(rng, dummy)
        prompts = self.prompt.apply(p_vars, dummy)
        t_vars = self.text.init(rng, prompts, self.prompt.eot_index)
        return {"prompt": p_vars["params"], "text": t_vars["params"]}

    def encode(self, params, labels):
        prompts = self.prompt.apply({"params": params["prompt"]}, labels)
        return self.text.apply(
            {"params": params["text"]}, prompts, self.prompt.eot_index
        )


def learn_identity_prompts(
    image_feats: np.ndarray,
    labels: np.ndarray,
    cfg: PromptStageConfig | None = None,
    train_text: bool = False,
    pretrained: dict | None = None,
    template: str = "A photo of a X X X X person.",
):
    """Run stage 1: returns (stage, params, history).

    `image_feats` (N, F) are frozen image-encoder features for the
    training set; `labels` (N,) their identity ids.  Only the
    per-identity context vectors (and template embeddings) train unless
    `train_text=True` — matching the reference, whose CLIP text
    transformer stays frozen at its pretrained weights.  Without
    pretrained text weights, `train_text=True` lets the tower co-train
    from scratch.

    `pretrained` takes the dict returned by models.convert.convert_clip:
    the text tower loads OpenAI weights (frozen), the prompt template is
    embedded with the pretrained token embeddings via the real BPE
    tokenizer, and ONLY the per-identity context vectors train — the
    reference's actual stage-1 initialization
    (make_model_clipreid.py:232-278).
    """
    cfg = cfg or PromptStageConfig(num_classes=int(labels.max()) + 1)
    rng = jax.random.PRNGKey(cfg.seed)
    if pretrained is not None:
        from boxmot_tpu.models.clip_reid import pretrained_prompt_template

        text_params = pretrained["text"]["params"]
        tok_emb = pretrained["token_embedding"]
        cfg = dataclasses.replace(
            cfg,
            width=int(tok_emb.shape[1]),
            text_heads=max(1, int(tok_emb.shape[1]) // 64),  # CLIP: 64-d heads
            text_layers=sum(k.startswith("resblock") for k in text_params),
            feat_dim=int(text_params["text_projection"].shape[-1]),
        )
        prefix, suffix, _ = pretrained_prompt_template(
            tok_emb, template, cfg.n_cls_ctx
        )
        stage = PromptStage(
            cfg,
            n_prefix=len(prefix),
            n_suffix=len(suffix),
            text_context=int(text_params["positional_embedding"].shape[0]),
        )
        params = stage.init(rng)
        params["prompt"] = {
            **params["prompt"],
            "token_prefix": jnp.asarray(prefix),
            "token_suffix": jnp.asarray(suffix),
        }
        params["text"] = jax.tree.map(jnp.asarray, text_params)
        if train_text:
            raise ValueError("pretrained text tower trains frozen")
    else:
        stage = PromptStage(cfg)
        params = stage.init(rng)

    tx = optax.adam(cfg.lr)
    if pretrained is not None:
        # reference stage 1: only the per-identity context vectors move;
        # the template embeddings are frozen buffers
        trainable = {"prompt": {"cls_ctx": params["prompt"]["cls_ctx"]}}
    elif train_text:
        trainable = params
    else:
        trainable = {"prompt": params["prompt"]}
    opt_state = tx.init(trainable)

    feats = jnp.asarray(image_feats, jnp.float32)
    labs = jnp.asarray(labels, jnp.int32)
    n = feats.shape[0]
    batch = min(cfg.batch, n)

    # pre-sample the whole index stream so the loop is a lax.scan
    sample_rng = np.random.default_rng(cfg.seed)
    idx_stream = jnp.asarray(
        sample_rng.integers(0, n, size=(cfg.steps, batch)), jnp.int32
    )

    def select(tree, like):
        """Slice `tree` down to the structure of `like` (nested dicts)."""
        if not isinstance(like, dict):
            return tree
        return {k: select(tree[k], v) for k, v in like.items()}

    def merge(base, upd):
        if not isinstance(upd, dict):
            return upd
        return {
            k: merge(base[k], upd[k]) if k in upd else base[k] for k in base
        }

    def step(carry, idxs):
        params, opt_state = carry

        def loss_fn(train_params):
            txt = stage.encode(merge(params, train_params), labs[idxs])
            return clip_prompt_losses(
                feats[idxs], txt, labs[idxs], cfg.temperature
            )

        train_params = select(params, trainable)
        loss, grads = jax.value_and_grad(loss_fn)(train_params)
        updates, new_opt = tx.update(grads, opt_state, train_params)
        new_train = optax.apply_updates(train_params, updates)
        return (merge(params, new_train), new_opt), loss

    (params, _), losses = jax.lax.scan(step, (params, opt_state), idx_stream)
    return stage, params, np.asarray(losses)
