// C ABI for the host cuckoo-hash KV store (dht.h), consumed via ctypes.

#include <cstdint>

#include "dht.h"

using verticut::Dht;

extern "C" {

void* vt_dht_create(uint64_t n_slots, uint64_t arena_bytes) {
  return new Dht(n_slots, arena_bytes);
}

void vt_dht_destroy(void* h) { delete static_cast<Dht*>(h); }

int vt_dht_put(void* h, const void* key, uint32_t klen, const void* val,
               uint32_t vlen) {
  return static_cast<Dht*>(h)->Put(key, klen, val, vlen);
}

int64_t vt_dht_get(void* h, const void* key, uint32_t klen, void* out,
                   uint64_t cap) {
  return static_cast<Dht*>(h)->Get(key, klen, out, cap);
}

int vt_dht_contains(void* h, const void* key, uint32_t klen) {
  return static_cast<Dht*>(h)->Contains(key, klen) ? 1 : 0;
}

int vt_dht_remove(void* h, const void* key, uint32_t klen) {
  return static_cast<Dht*>(h)->Remove(key, klen);
}

uint64_t vt_dht_count(void* h) { return static_cast<Dht*>(h)->Count(); }

uint64_t vt_dht_capacity(void* h) { return static_cast<Dht*>(h)->Capacity(); }

// out[7]: puts, gets, removes, probes, kicks, resizes, crc_failures
void vt_dht_stats(void* h, uint64_t* out) {
  const Dht::Stats& s = static_cast<Dht*>(h)->GetStats();
  out[0] = s.puts;
  out[1] = s.gets;
  out[2] = s.removes;
  out[3] = s.probes;
  out[4] = s.kicks;
  out[5] = s.resizes;
  out[6] = s.crc_failures;
}

}  // extern "C"
