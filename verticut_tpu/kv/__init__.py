from verticut_tpu.kv.store import (BucketStore, DHTStore, KVStore,  # noqa: F401
                                   MemoryKV, OpLogKV, ShardedKV, make_store)
from verticut_tpu.kv.remote import (KVServer, MemcachedKV,  # noqa: F401
                                    RedisKV)
