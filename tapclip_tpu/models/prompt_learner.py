"""Prompt learner: per-class learnable context vectors.

TPU-native rebuild of ``/root/reference/models/prompt_learner.py``.  The
reference keeps a ``nn.ParameterDict`` of per-class ``[prompt_len, D]``
tensors plus a dict of frozen 77-token template embeddings and concatenates
them in a Python loop (``prompt_learner.py:45-66``).  Here the class axis is a
single stacked, **padded** array so the whole bank is one pytree leaf:

* ``ctx``        ``[C_max, P, D]``  learnable context vectors
* ``token_embs`` ``[C_max, 77, D]`` frozen template embeddings
* ``class_mask`` ``[C_max]``        which slots are live

Padding the class axis is what makes ``add_class_prompt`` — the seen->unseen
mechanism exercised at eval time (``test_cross_domain.py:65-67``) — a pure
functional buffer update instead of a shape change, so jitted functions never
retrace (SURVEY.md §7 hard part 3).  Capacity grows in chunks when exceeded.

Context init matches the reference exactly (``prompt_learner.py:36-41``):
tokenize ``"a photo of a {name}"``, embed, and copy embedding positions
``5 : 5+P`` (i.e. starting at the class-name token) when ``use_init_prompt``;
otherwise Gaussian.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tapclip_tpu.config import CLIPConfig, PromptConfig
from tapclip_tpu.data.tokenizer import SimpleTokenizer

_GROW_CHUNK = 8


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PromptBank:
    """Stacked prompt state. ``ctx`` is the only trainable leaf."""

    ctx: jnp.ndarray  # [C_max, P, D] learnable
    token_embs: jnp.ndarray  # [C_max, 77, D] frozen
    class_mask: jnp.ndarray  # [C_max] bool
    eot_pos: jnp.ndarray  # [C_max] int32 — EOT index in the template tokens

    def tree_flatten(self):
        return (self.ctx, self.token_embs, self.class_mask, self.eot_pos), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def capacity(self) -> int:
        return self.ctx.shape[0]


def build_prompts(ctx: jnp.ndarray, token_embs: jnp.ndarray) -> jnp.ndarray:
    """``[C, P, D] ++ [C, 77, D] -> [C, P+77, D]`` (prompt_learner.py:62-65)."""
    return jnp.concatenate([ctx, token_embs.astype(ctx.dtype)], axis=1)


class PromptLearner:
    """Host-side registry + functional prompt bank.

    Mirrors the reference class's API surface (``add_class_prompt``,
    ``n_cls``, callable returning stacked prompts) while keeping all device
    state in the immutable ``PromptBank``.
    """

    def __init__(
        self,
        class_names: Sequence[str],
        clip_params,
        clip_cfg: CLIPConfig,
        prompt_cfg: PromptConfig,
        tokenizer: SimpleTokenizer,
        *,
        rng: Optional[jax.Array] = None,
        banner: bool = True,
    ):
        self.clip_cfg = clip_cfg
        self.prompt_cfg = prompt_cfg
        self.tokenizer = tokenizer
        self._token_embedding = np.asarray(
            clip_params["text"]["token_embedding"], np.float32
        )
        self.class_names: List[str] = []
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)

        P, D = prompt_cfg.prompt_len, clip_cfg.text_width
        cap = max(prompt_cfg.max_classes, _GROW_CHUNK)
        self.bank = PromptBank(
            ctx=jnp.zeros((cap, P, D), jnp.float32),
            token_embs=jnp.zeros((cap, clip_cfg.context_length, D), jnp.float32),
            class_mask=jnp.zeros((cap,), bool),
            eot_pos=jnp.zeros((cap,), jnp.int32),
        )
        # Construction banner, byte-identical to the reference's
        # (prompt_learner.py:21).  Note ``class_specific`` is stored and
        # printed but never otherwise consumed by the reference either —
        # its context bank is per-class unconditionally; we mirror that.
        # ``banner=False`` for internal throwaway learners (e.g. the
        # multi-template anchor builder) so quiet paths stay quiet.
        if banner:
            print(
                f"cls_specific: {prompt_cfg.class_specific}, "
                f"use_init_prompt: {prompt_cfg.use_init_prompt}"
            )
        for name in class_names:
            self.add_class_prompt(name)

    # -- reference API parity ------------------------------------------------

    @property
    def n_cls(self) -> int:  # prompt_learner.py:68-70
        return len(self.class_names)

    def __call__(self) -> jnp.ndarray:
        """Stacked ``[n_cls, P+77, D]`` prompts for live classes."""
        n = self.n_cls
        return build_prompts(self.bank.ctx[:n], self.bank.token_embs[:n])

    def add_class_prompt(self, class_name: str) -> None:
        """Register a class; no-op if present (prompt_learner.py:27-28)."""
        if class_name in self.class_names:
            return
        idx = len(self.class_names)
        if idx >= self.bank.capacity:
            self._grow(self.bank.capacity + _GROW_CHUNK)

        token_emb, ctx_init, eot = self._init_for_class(class_name)
        self.bank = PromptBank(
            ctx=self.bank.ctx.at[idx].set(ctx_init),
            token_embs=self.bank.token_embs.at[idx].set(token_emb),
            class_mask=self.bank.class_mask.at[idx].set(True),
            eot_pos=self.bank.eot_pos.at[idx].set(eot),
        )
        self.class_names.append(class_name)

    # -- internals -----------------------------------------------------------

    def _init_for_class(self, class_name: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg, pcfg = self.clip_cfg, self.prompt_cfg
        # Class-name templates use the folder name with underscores as-is,
        # matching the reference (prompt_learner.py:31 uses the raw name).
        text = pcfg.template.format(class_name)
        ids = self.tokenizer.tokenize([text], cfg.context_length)[0]
        token_emb = jnp.asarray(self._token_embedding[ids])  # [77, D]
        eot = int(np.argmax(ids))  # EOT has the largest token id

        P = pcfg.prompt_len
        if pcfg.use_init_prompt and token_emb.shape[0] >= 5 + P:
            ctx_init = token_emb[5 : 5 + P]  # prompt_learner.py:37-39
        else:
            self._rng, sub = jax.random.split(self._rng)
            ctx_init = jax.random.normal(sub, (P, cfg.text_width), jnp.float32)
        return token_emb, ctx_init, eot

    def _grow(self, new_cap: int) -> None:
        b = self.bank

        def pad_to(x, cap):
            pad = [(0, cap - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad)

        self.bank = PromptBank(
            ctx=pad_to(b.ctx, new_cap),
            token_embs=pad_to(b.token_embs, new_cap),
            class_mask=pad_to(b.class_mask, new_cap),
            eot_pos=pad_to(b.eot_pos, new_cap),
        )

    # -- (de)serialization helpers -------------------------------------------

    def load_ctx(self, ctx_by_name: Dict[str, np.ndarray]) -> None:
        """Load per-class context vectors by class name (checkpoint restore).

        Two phases: register every unseen class FIRST (each add replaces
        ``self.bank``, possibly growing capacity), then apply all vectors to
        one ctx buffer — interleaving the two would discard earlier
        ``.at[].set()`` updates whenever a new class appears mid-loop.
        """
        for name in ctx_by_name:
            if name not in self.class_names:
                self.add_class_prompt(name)
        ctx = self.bank.ctx
        for name, arr in ctx_by_name.items():
            idx = self.class_names.index(name)
            ctx = ctx.at[idx].set(jnp.asarray(arr, jnp.float32))
        self.bank = dataclasses.replace(self.bank, ctx=ctx)

    def ctx_by_name(self) -> Dict[str, np.ndarray]:
        return {
            name: np.asarray(self.bank.ctx[i])
            for i, name in enumerate(self.class_names)
        }
