// Lock-free SPSC float ring buffer + block reassembler for the realtime
// audio host (the C++ side of nn~-style serving).
//
// The reference delegates realtime buffering to the nn~ Max/PD external
// (C++, consuming its TorchScript export; reference README.md:184-219).
// Here the equivalent native piece is explicit: an audio thread pushes
// device-rate samples; a model thread pops fixed model-block chunks,
// runs the compiled TPU/CPU step, and pushes results back. Both sides
// are wait-free (single producer / single consumer, acquire/release
// atomics), so the audio callback never blocks on the model.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <new>

namespace {

struct Ring {
  float* data;
  uint64_t capacity;  // power of two
  alignas(64) std::atomic<uint64_t> head;  // write index (producer)
  alignas(64) std::atomic<uint64_t> tail;  // read index (consumer)
};

inline uint64_t next_pow2(uint64_t v) {
  uint64_t p = 1;
  while (p < v) p <<= 1;
  return p;
}

}  // namespace

extern "C" {

Ring* rb_create(uint64_t min_capacity) {
  Ring* r = new (std::nothrow) Ring();
  if (!r) return nullptr;
  r->capacity = next_pow2(min_capacity);
  r->data = new (std::nothrow) float[r->capacity];
  if (!r->data) {
    delete r;
    return nullptr;
  }
  r->head.store(0, std::memory_order_relaxed);
  r->tail.store(0, std::memory_order_relaxed);
  return r;
}

void rb_destroy(Ring* r) {
  if (!r) return;
  delete[] r->data;
  delete r;
}

uint64_t rb_readable(const Ring* r) {
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

uint64_t rb_writable(const Ring* r) {
  return r->capacity - rb_readable(r);
}

// Producer: returns number of samples actually written (may be < n when
// full -- the caller decides whether that is an overrun).
uint64_t rb_write(Ring* r, const float* src, uint64_t n) {
  const uint64_t head = r->head.load(std::memory_order_relaxed);
  const uint64_t tail = r->tail.load(std::memory_order_acquire);
  const uint64_t free_space = r->capacity - (head - tail);
  if (n > free_space) n = free_space;
  const uint64_t mask = r->capacity - 1;
  const uint64_t first = head & mask;
  const uint64_t chunk = (first + n <= r->capacity) ? n : r->capacity - first;
  std::memcpy(r->data + first, src, chunk * sizeof(float));
  std::memcpy(r->data, src + chunk, (n - chunk) * sizeof(float));
  r->head.store(head + n, std::memory_order_release);
  return n;
}

// Consumer: returns number of samples actually read.
uint64_t rb_read(Ring* r, float* dst, uint64_t n) {
  const uint64_t tail = r->tail.load(std::memory_order_relaxed);
  const uint64_t head = r->head.load(std::memory_order_acquire);
  const uint64_t avail = head - tail;
  if (n > avail) n = avail;
  const uint64_t mask = r->capacity - 1;
  const uint64_t first = tail & mask;
  const uint64_t chunk = (first + n <= r->capacity) ? n : r->capacity - first;
  std::memcpy(dst, r->data + first, chunk * sizeof(float));
  std::memcpy(dst + chunk, r->data, (n - chunk) * sizeof(float));
  r->tail.store(tail + n, std::memory_order_release);
  return n;
}

// Blocking helpers are intentionally absent: realtime audio callbacks
// must never block. The model thread spins/sleeps at its own cadence.

}  // extern "C"
