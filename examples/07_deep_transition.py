"""Deep (2-layer) GP-SSM transition on the kink dynamics — the reference's
dead ``--n_layers`` path made live (model/deep.py; its ``propagate``,
dgp_model.py:362-379, has no call site upstream).

The hidden layer is a doubly-stochastic whitened sparse GP grafted between
the state and the head GP; at init (hidden U = 0) the model IS the shallow
one, so the comparison below starts from identical objectives.

Run:  python examples/07_deep_transition.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import dataclasses

import jax
import jax.numpy as jnp

from ffvd_tpu.config import FFVDConfig
from ffvd_tpu.data.synthetic import generate_kink
from ffvd_tpu.inference.trainer import Trainer
from ffvd_tpu.model.params import (SSMData, init_hidden_layers,
                                   init_params_random)

ds = generate_kink(n=100, seed=0)
data = SSMData(y=jnp.asarray(ds.y_train), control=jnp.zeros((200, 0)))
shallow = init_params_random(jax.random.key(0), n=100, x_dim=2, m=16,
                             control_dim=0, p=1)
deep = dataclasses.replace(
    shallow, hidden=init_hidden_layers(jax.random.key(1), 1, shallow))

for name, n_layers, params in (("shallow", 1, shallow), ("deep-2", 2, deep)):
    cfg = FFVDConfig(case=1, num_inducing=16, x_dim=2, iterations=200,
                     n_layers=n_layers)
    tr = Trainer(cfg, data)
    state, nlls = tr.run(tr.init_state(params), 400, jax.random.key(2),
                         chunk_size=200)
    print(f"{name}: nll {float(nlls[0]):+.4f} -> {float(nlls[-1]):+.4f}")
