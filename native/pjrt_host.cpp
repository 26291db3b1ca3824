// pjrt_host — standalone C++ serving host for exported rave_tpu models.
//
// The reference serves exported models through the nn~ C++ external and
// the TorchScript VM (reference README.md:184-219, scripts/export.py).
// Here the exported artifact is raw StableHLO (written by
// rave_tpu/export/streaming.py::_serialize_pjrt_host_artifacts) and this
// host runs it through the PJRT C API — the same ABI every XLA backend
// (CPU/TPU plugins) exposes — with zero Python at serving time.
//
// Usage:
//   pjrt_host <plugin.so> <export_dir> [n_blocks] [client_options...]
//
// client_options are key=value pairs forwarded to PJRT_Client_Create as
// PJRT_NamedValues; values parse as int64 when fully numeric, else as
// strings (e.g. `remote_compile=1 topology=v5e:1x1x1 session_id=abc`).
// Standard CPU/TPU plugins need none; proxying plugins take their pool
// configuration this way.
//
// Per audio block the compiled function is a pure step
//   (cache..., x) -> (y, cache...)
// with the cache inputs donated (input/output aliased on-device), so the
// loop body is: execute, feed returned cache buffers into the next call.
// Prints blocks/s and the real-time factor.

#include <dlfcn.h>

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

struct TensorSpec {
  PJRT_Buffer_Type type;
  size_t nbytes;
  std::vector<int64_t> dims;
};

PJRT_Buffer_Type ParseDtype(const std::string& name) {
  if (name == "float32") return PJRT_Buffer_Type_F32;
  if (name == "bfloat16") return PJRT_Buffer_Type_BF16;
  if (name == "float16") return PJRT_Buffer_Type_F16;
  if (name == "int32") return PJRT_Buffer_Type_S32;
  if (name == "int8") return PJRT_Buffer_Type_S8;
  if (name == "uint32") return PJRT_Buffer_Type_U32;
  if (name == "bool") return PJRT_Buffer_Type_PRED;
  std::fprintf(stderr, "unsupported dtype in manifest: %s\n", name.c_str());
  std::exit(1);
}

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path.c_str());
    std::exit(1);
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

const PJRT_Api* g_api = nullptr;

void Check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.extension_start = nullptr;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  std::fprintf(stderr, "%s failed: %.*s\n", what,
               static_cast<int>(margs.message_size), margs.message);
  PJRT_Error_Destroy_Args dargs;
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.extension_start = nullptr;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  std::exit(1);
}

void AwaitAndDestroy(PJRT_Event* event, const char* what) {
  PJRT_Event_Await_Args aw;
  aw.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  aw.extension_start = nullptr;
  aw.event = event;
  Check(g_api->PJRT_Event_Await(&aw), what);
  PJRT_Event_Destroy_Args ed;
  ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  ed.extension_start = nullptr;
  ed.event = event;
  Check(g_api->PJRT_Event_Destroy(&ed), "Event_Destroy");
}

PJRT_Buffer* HostToDevice(PJRT_Client* client, PJRT_Device* device,
                          const void* data, const TensorSpec& spec) {
  PJRT_Client_BufferFromHostBuffer_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  args.client = client;
  args.data = data;
  args.type = spec.type;
  args.dims = spec.dims.data();
  args.num_dims = spec.dims.size();
  args.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  args.device = device;
  Check(g_api->PJRT_Client_BufferFromHostBuffer(&args),
        "BufferFromHostBuffer");
  AwaitAndDestroy(args.done_with_host_buffer, "host->device transfer");
  return args.buffer;
}

void DestroyBuffer(PJRT_Buffer* b) {
  PJRT_Buffer_Destroy_Args args;
  args.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  args.extension_start = nullptr;
  args.buffer = b;
  Check(g_api->PJRT_Buffer_Destroy(&args), "Buffer_Destroy");
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <plugin.so> <export_dir> [n_blocks]\n",
                 argv[0]);
    return 1;
  }
  const std::string plugin_path = argv[1];
  const std::string dir = argv[2];
  const int n_blocks = argc > 3 ? std::atoi(argv[3]) : 100;

  // optional key=value client-create options (argv[4:]).  `prefix=NAME`
  // is consumed by the host itself: it selects which exported step to
  // serve (default `forward`; `prefix=convert` runs the myforward
  // voice-conversion step written by `rave-tpu export --voice_conversion`).
  std::string prefix = "forward";
  std::vector<std::string> opt_keys, opt_strs;
  std::vector<int64_t> opt_ints;
  std::vector<bool> opt_is_int;
  for (int i = 4; i < argc; ++i) {
    const char* eq = std::strchr(argv[i], '=');
    if (!eq) continue;
    std::string key(argv[i], eq - argv[i]);
    std::string val(eq + 1);
    if (key == "prefix") {
      prefix = val;
      continue;
    }
    opt_keys.push_back(std::move(key));
    char* end = nullptr;
    long long iv = std::strtoll(val.c_str(), &end, 10);
    bool is_int = end && *end == '\0' && !val.empty();
    opt_is_int.push_back(is_int);
    opt_ints.push_back(is_int ? iv : 0);
    opt_strs.push_back(std::move(val));
  }
  const std::string manifest_path =
      dir + (prefix == "forward" ? "/io_manifest.txt"
                                 : "/" + prefix + "_manifest.txt");
  const std::string cache_path =
      dir + (prefix == "forward" ? "/cache_init.bin"
                                 : "/" + prefix + "_cache_init.bin");

  void* handle = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_GLOBAL);
  if (!handle) {
    std::fprintf(stderr, "dlopen(%s): %s\n", plugin_path.c_str(), dlerror());
    return 1;
  }
  auto get_api =
      reinterpret_cast<const PJRT_Api* (*)()>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) {
    std::fprintf(stderr, "GetPjrtApi not found in %s\n", plugin_path.c_str());
    return 1;
  }
  g_api = get_api();
  std::fprintf(stderr, "PJRT api %d.%d\n", g_api->pjrt_api_version.major_version,
               g_api->pjrt_api_version.minor_version);

  PJRT_Plugin_Initialize_Args pinit;
  std::memset(&pinit, 0, sizeof(pinit));
  pinit.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  Check(g_api->PJRT_Plugin_Initialize(&pinit), "Plugin_Initialize");

  // ---- client ----------------------------------------------------------
  std::vector<PJRT_NamedValue> options(opt_keys.size());
  for (size_t i = 0; i < opt_keys.size(); ++i) {
    PJRT_NamedValue& nv = options[i];
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = opt_keys[i].c_str();
    nv.name_size = opt_keys[i].size();
    if (opt_is_int[i]) {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = opt_ints[i];
      nv.value_size = 1;
    } else {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = opt_strs[i].c_str();
      nv.value_size = opt_strs[i].size();
    }
  }
  PJRT_Client_Create_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = options.data();
  cargs.num_options = options.size();
  Check(g_api->PJRT_Client_Create(&cargs), "Client_Create");
  PJRT_Client* client = cargs.client;

  PJRT_Client_AddressableDevices_Args dev_args;
  std::memset(&dev_args, 0, sizeof(dev_args));
  dev_args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dev_args.client = client;
  Check(g_api->PJRT_Client_AddressableDevices(&dev_args),
        "AddressableDevices");
  if (dev_args.num_addressable_devices == 0) {
    std::fprintf(stderr, "no addressable devices\n");
    return 1;
  }
  PJRT_Device* device = dev_args.addressable_devices[0];

  // ---- manifest --------------------------------------------------------
  std::ifstream mf(manifest_path);
  if (!mf) {
    std::fprintf(stderr, "cannot open %s\n", manifest_path.c_str());
    return 1;
  }
  int64_t chunk = 0, sample_rate = 0, batch = 0;
  std::vector<TensorSpec> in_specs, out_specs;
  std::string line;
  while (std::getline(mf, line)) {
    std::istringstream ls(line);
    std::string kind;
    ls >> kind;
    if (kind == "meta") {
      ls >> chunk >> sample_rate >> batch;
      continue;
    }
    std::string dtype;
    size_t nbytes, ndims;
    ls >> dtype >> nbytes >> ndims;
    TensorSpec spec;
    spec.type = ParseDtype(dtype);
    spec.nbytes = nbytes;
    spec.dims.resize(ndims);
    for (size_t i = 0; i < ndims; ++i) ls >> spec.dims[i];
    (kind == "in" ? in_specs : out_specs).push_back(std::move(spec));
  }
  // call convention: (cache..., extra...) -> (y, cache...), so the cache
  // leaf count comes from the outputs; forward has one extra input (x),
  // convert has three (x, speaker embedding, pitch feature)
  const size_t num_args = in_specs.size();
  const size_t num_cache = out_specs.size() - 1;
  if (num_cache > num_args) {
    std::fprintf(stderr, "manifest: more cache outputs than inputs\n");
    return 1;
  }
  const size_t num_extra = num_args - num_cache;
  std::fprintf(stderr,
               "model: step=%s chunk=%lld sr=%lld batch=%lld "
               "cache_leaves=%zu extra_inputs=%zu\n",
               prefix.c_str(), static_cast<long long>(chunk),
               static_cast<long long>(sample_rate),
               static_cast<long long>(batch), num_cache, num_extra);

  // ---- compile ---------------------------------------------------------
  std::string mlir = ReadFile(dir + "/" + prefix + ".mlir");
  std::string copts = ReadFile(dir + "/compile_options.pb");
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = mlir.data();
  program.code_size = mlir.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args comp;
  std::memset(&comp, 0, sizeof(comp));
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  comp.compile_options = copts.data();
  comp.compile_options_size = copts.size();
  auto t_compile0 = std::chrono::steady_clock::now();
  Check(g_api->PJRT_Client_Compile(&comp), "Client_Compile");
  PJRT_LoadedExecutable* executable = comp.executable;
  std::fprintf(stderr, "compiled in %.1fs\n",
               std::chrono::duration<double>(
                   std::chrono::steady_clock::now() - t_compile0)
                   .count());

  // ---- initial buffers -------------------------------------------------
  std::string cache_init = ReadFile(cache_path);
  std::vector<PJRT_Buffer*> args_buf(num_args);
  size_t off = 0;
  for (size_t i = 0; i < num_cache; ++i) {
    if (off + in_specs[i].nbytes > cache_init.size()) {
      std::fprintf(stderr, "%s too small\n", cache_path.c_str());
      return 1;
    }
    args_buf[i] =
        HostToDevice(client, device, cache_init.data() + off, in_specs[i]);
    off += in_specs[i].nbytes;
  }
  // extra inputs (audio chunk, and for convert: speaker embedding +
  // pitch feature): silence/zeros -- serving hosts fill these per block
  for (size_t i = num_cache; i < num_args; ++i) {
    std::vector<uint8_t> host(in_specs[i].nbytes, 0);
    args_buf[i] = HostToDevice(client, device, host.data(), in_specs[i]);
  }

  // ---- run loop --------------------------------------------------------
  // The cache args are donated (jax donate_argnums=(0,)): tell PJRT the
  // extra inputs are non-donatable, and rebind outputs 1..N as the next
  // call's cache inputs.
  std::vector<int64_t> non_donatable(num_extra);
  for (size_t i = 0; i < num_extra; ++i)
    non_donatable[i] = static_cast<int64_t>(num_cache + i);
  std::vector<PJRT_Buffer*> outs(out_specs.size());
  PJRT_Buffer** out_list = outs.data();

  auto run_once = [&]() {
    PJRT_ExecuteOptions opts;
    std::memset(&opts, 0, sizeof(opts));
    opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    opts.non_donatable_input_indices = non_donatable.data();
    opts.num_non_donatable_input_indices = non_donatable.size();

    PJRT_Buffer* const* arg_list = args_buf.data();
    PJRT_Event* done = nullptr;
    PJRT_LoadedExecutable_Execute_Args ex;
    std::memset(&ex, 0, sizeof(ex));
    ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ex.executable = executable;
    ex.options = &opts;
    ex.argument_lists = &arg_list;
    ex.num_devices = 1;
    ex.num_args = num_args;
    ex.output_lists = &out_list;
    ex.device_complete_events = &done;
    Check(g_api->PJRT_LoadedExecutable_Execute(&ex), "Execute");
    AwaitAndDestroy(done, "execution");
    // donated cache buffers are consumed; drop our handles and take the
    // returned ones (output 0 is the audio block)
    for (size_t i = 0; i < num_cache; ++i) {
      DestroyBuffer(args_buf[i]);
      args_buf[i] = outs[i + 1];
    }
    return outs[0];
  };

  // like a DAW host: every block's audio comes back to host memory
  // before the next block is submitted (the honest per-block latency,
  // not just the enqueue rate)
  std::vector<uint8_t> y_host(out_specs[0].nbytes);
  auto fetch = [&](PJRT_Buffer* y) {
    PJRT_Buffer_ToHostBuffer_Args th;
    std::memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = y;
    th.dst = y_host.data();
    th.dst_size = y_host.size();
    Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer");
    AwaitAndDestroy(th.event, "device->host transfer");
    DestroyBuffer(y);
  };

  fetch(run_once());  // warmup (first dispatch)

  // 1) pipelined throughput: submit block b+1 as soon as block b's
  //    execution completes on-device (outputs stay device-resident, the
  //    way a server streaming to a device-side consumer would run)
  auto t0 = std::chrono::steady_clock::now();
  for (int b = 0; b < n_blocks; ++b) {
    PJRT_Buffer* y = run_once();
    if (b + 1 == n_blocks) fetch(y); else DestroyBuffer(y);
  }
  double dt_pipe =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();

  // 2) blocking per-block latency: the DAW-host pattern -- every block's
  //    audio is copied back to host memory before the next submit.  (In
  //    this sandbox the device is tunnelled, so this is bounded by the
  //    network round trip, not the chip.)
  t0 = std::chrono::steady_clock::now();
  for (int b = 0; b < n_blocks; ++b) fetch(run_once());
  double dt =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();

  double audio_s =
      static_cast<double>(n_blocks) * static_cast<double>(chunk) /
      static_cast<double>(sample_rate);
  double checksum = 0;
  const float* yf = reinterpret_cast<const float*>(y_host.data());
  for (size_t i = 0; i < out_specs[0].nbytes / 4; ++i) checksum += yf[i];
  std::printf(
      "{\"blocks\": %d, \"pipelined_blocks_per_s\": %.2f, "
      "\"pipelined_rtf\": %.5f, \"blocking_rtf\": %.5f, "
      "\"checksum\": %.6f}\n",
      n_blocks, n_blocks / dt_pipe, dt_pipe / audio_s, dt / audio_s,
      checksum);
  return 0;
}
