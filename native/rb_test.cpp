// Self-test for the SPSC ring buffer: threaded producer/consumer with
// sequence verification.
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <thread>
#include <vector>

extern "C" {
struct Ring;
Ring* rb_create(uint64_t);
void rb_destroy(Ring*);
uint64_t rb_write(Ring*, const float*, uint64_t);
uint64_t rb_read(Ring*, float*, uint64_t);
uint64_t rb_readable(const Ring*);
}

int main() {
  Ring* r = rb_create(1 << 12);
  const uint64_t N = 1 << 20;
  std::thread producer([&] {
    uint64_t sent = 0;
    std::vector<float> buf(257);
    while (sent < N) {
      uint64_t n = std::min<uint64_t>(257, N - sent);
      for (uint64_t i = 0; i < n; i++) buf[i] = float(sent + i);
      uint64_t w = rb_write(r, buf.data(), n);
      sent += w;
    }
  });
  uint64_t got = 0;
  std::vector<float> out(511);
  while (got < N) {
    uint64_t n = rb_read(r, out.data(), 511);
    for (uint64_t i = 0; i < n; i++) {
      if (out[i] != float(got + i)) {
        printf("FAIL at %lu: %f != %f\n", got + i, out[i], float(got + i));
        return 1;
      }
    }
    got += n;
  }
  producer.join();
  rb_destroy(r);
  printf("ring buffer self-test OK (%lu samples)\n", (unsigned long)N);
  return 0;
}
