from verticut_tpu.kv.store import (BucketStore, DHTStore, KVStore,  # noqa: F401
                                   MemoryKV, ShardedKV, make_store)
