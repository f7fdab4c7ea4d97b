"""Neural-network layer: pytree modules, flows, transformers, conditioners."""

from tfep_tpu.nn import module  # noqa: F401
from tfep_tpu.nn.module import (  # noqa: F401
    Module, static, buffer, partition, combine, filter_value_and_grad,
    apply_updates, n_parameters,
)
from tfep_tpu.nn import ensemble, graph, ode  # noqa: F401
from tfep_tpu.nn.ensemble import (  # noqa: F401
    stack_modules, unstack_module, n_members, ensemble_map,
    ensemble_init, make_ensemble_train_step,
)
