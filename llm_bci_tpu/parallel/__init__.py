from llm_bci_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    device_put_sharded_batch,
    make_mesh,
    tp_llama_rules,
    replicated,
    shard_pytree,
)
