// Serving binary: target-speaker extraction with RTF reporting.
// TPU-native counterpart of /root/reference/runtime/bin/separate_main.cc:
// same CLI surface (single utterance or 4-column wav_scp), per-utterance
// and total RTF logging, <key>-spk{1,2}.wav outputs. Flags are parsed with
// a tiny built-in parser (no gflags dependency in this build).
#include <dlfcn.h>
#include <sys/stat.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <cstdio>
#include <cstring>
#include <functional>
#include <iostream>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "frontend/wav.h"
#include "separate/separate_engine.h"
#include "utils/timer.h"
#include "utils/utils.h"

namespace {

struct Flags {
  std::string model_path;
  std::string wav_path;
  std::string spk1_enroll;
  std::string spk2_enroll;
  std::string wav_scp;
  std::string result_dir = ".";
  int feat_dim = 80;
  int sample_rate = 16000;
  // scp mode: decode utterances on N parallel engines (TF engine only;
  // the reference binary is strictly sequential)
  int num_threads = 1;
};

bool ParseFlags(int argc, char** argv, Flags* flags) {
  std::map<std::string, std::string*> str_flags = {
      {"--model_path", &flags->model_path},
      {"--wav_path", &flags->wav_path},
      {"--spk1_enroll", &flags->spk1_enroll},
      {"--spk2_enroll", &flags->spk2_enroll},
      {"--wav_scp", &flags->wav_scp},
      {"--result_dir", &flags->result_dir},
  };
  std::map<std::string, int*> int_flags = {
      {"--feat_dim", &flags->feat_dim},
      {"--sample_rate", &flags->sample_rate},
      {"--num_threads", &flags->num_threads},
  };
  for (int i = 1; i < argc; ++i) {
    std::string arg = argv[i];
    auto eq = arg.find('=');
    std::string key = eq == std::string::npos ? arg : arg.substr(0, eq);
    std::string value;
    if (eq != std::string::npos) {
      value = arg.substr(eq + 1);
    } else if (i + 1 < argc) {
      value = argv[++i];
    } else {
      std::cerr << "missing value for " << key << "\n";
      return false;
    }
    if (str_flags.count(key)) {
      *str_flags[key] = value;
    } else if (int_flags.count(key)) {
      *int_flags[key] = std::stoi(value);
    } else {
      std::cerr << "unknown flag " << key << "\n";
      return false;
    }
  }
  if (flags->model_path.empty()) {
    std::cerr << "usage: separate_main --model_path DIR "
              << "(--wav_path MIX --spk1_enroll E1 --spk2_enroll E2 | "
              << "--wav_scp SCP) [--result_dir DIR]\n";
    return false;
  }
  return true;
}

bool FileExists(const std::string& path) {
  struct stat st;
  return stat(path.c_str(), &st) == 0;
}

// The TF engine is dlopen'ed on demand: libtensorflow's absl/protobuf
// symbols clash with jaxlib's if both are mapped in one process, so the
// binary must not link TF — only the SavedModel path loads it, and the
// embedded-CPython path never sees TF symbols.
struct TfEngineLib {
  void* (*create)(const char*, int, int, char*, int);
  int (*sample_rate)(void*);
  int (*forward)(void*, const float*, int, const float*, int, const float*,
                 int, char*, int);
  const float* (*output)(void*, int, int*);
  void (*destroy)(void*);

  static TfEngineLib* Load(const char* argv0) {
    // look next to the binary first, then LD_LIBRARY_PATH
    std::vector<std::string> candidates;
    char exe[4096];
    ssize_t n = readlink("/proc/self/exe", exe, sizeof(exe) - 1);
    if (n > 0) {
      exe[n] = '\0';
      std::string dir(exe);
      size_t slash = dir.rfind('/');
      if (slash != std::string::npos) {
        candidates.push_back(dir.substr(0, slash + 1) +
                             "libwesep_tf_engine.so");
      }
    }
    (void)argv0;
    candidates.push_back("libwesep_tf_engine.so");
    void* so = nullptr;
    for (const auto& c : candidates) {
      so = dlopen(c.c_str(), RTLD_NOW | RTLD_LOCAL);
      if (so != nullptr) break;
    }
    if (so == nullptr) {
      std::cerr << "cannot load libwesep_tf_engine.so: " << dlerror()
                << "\n";
      return nullptr;
    }
    auto* lib = new TfEngineLib;
    lib->create = reinterpret_cast<decltype(lib->create)>(
        dlsym(so, "wesep_tf_engine_create"));
    lib->sample_rate = reinterpret_cast<decltype(lib->sample_rate)>(
        dlsym(so, "wesep_tf_engine_sample_rate"));
    lib->forward = reinterpret_cast<decltype(lib->forward)>(
        dlsym(so, "wesep_tf_engine_forward"));
    lib->output = reinterpret_cast<decltype(lib->output)>(
        dlsym(so, "wesep_tf_engine_output"));
    lib->destroy = reinterpret_cast<decltype(lib->destroy)>(
        dlsym(so, "wesep_tf_engine_destroy"));
    if (lib->create == nullptr || lib->forward == nullptr ||
        lib->output == nullptr) {
      std::cerr << "libwesep_tf_engine.so is missing symbols\n";
      delete lib;
      return nullptr;
    }
    return lib;
  }
};

std::vector<float> Mono(const wesep::WavReader& reader) {
  const auto& data = reader.data();
  int nch = reader.num_channels();
  if (nch == 1) return data;
  std::vector<float> mono(reader.num_samples());
  for (int i = 0; i < reader.num_samples(); ++i) {
    float acc = 0.0f;
    for (int c = 0; c < nch; ++c) acc += data[i * nch + c];
    mono[i] = acc / nch;
  }
  return mono;
}

}  // namespace

int main(int argc, char** argv) {
  Flags flags;
  if (!ParseFlags(argc, argv, &flags)) return 1;

  // engine selection: a TF SavedModel export (saved_model.pb) runs
  // Python-free through the TF C API; anything else goes through the
  // embedded-CPython XLA engine
  std::string sm_dir;
  if (FileExists(flags.model_path + "/saved_model.pb")) {
    sm_dir = flags.model_path;
  } else if (FileExists(flags.model_path + "/saved_model/saved_model.pb")) {
    sm_dir = flags.model_path + "/saved_model";
  }
  using ForwardFn =
      std::function<void(const std::vector<float>&, const std::vector<float>&,
                         const std::vector<float>&,
                         std::vector<std::vector<float>>*)>;

  // utterances: key, mix, enroll1, enroll2
  std::vector<std::vector<std::string>> utts;
  if (!flags.wav_scp.empty()) {
    for (auto& row : wesep::ReadScp(flags.wav_scp)) {
      if (row.size() == 4) utts.push_back(row);
    }
  } else {
    utts.push_back(
        {"utt", flags.wav_path, flags.spk1_enroll, flags.spk2_enroll});
  }

  int num_threads = std::max(1, flags.num_threads);
  num_threads = std::min(
      num_threads, static_cast<int>(utts.empty() ? 1 : utts.size()));
  if (sm_dir.empty() && num_threads > 1) {
    std::printf(
        "embedded-python engine is single-threaded; --num_threads "
        "ignored\n");
    num_threads = 1;
  }

  int engine_sr = flags.sample_rate;
  std::unique_ptr<wesep::SeparateEngine> py_engine;
  TfEngineLib* tf_lib = nullptr;
  std::vector<void*> tf_handles;
  // one ForwardFn per worker: each TF worker owns a session handle (the
  // per-handle output buffer makes a shared handle thread-unsafe)
  std::vector<ForwardFn> forwards;
  if (!sm_dir.empty()) {
    tf_lib = TfEngineLib::Load(argv[0]);
    if (tf_lib == nullptr) {
      std::cerr << "model is a TF SavedModel but the TF engine library "
                << "is unavailable (build with WESEP_WITH_TF=ON)\n";
      return 1;
    }
    for (int t = 0; t < num_threads; ++t) {
      char err[1024] = {0};
      void* handle = tf_lib->create(sm_dir.c_str(), flags.feat_dim,
                                    flags.sample_rate, err, sizeof(err));
      if (handle == nullptr) {
        std::cerr << "TF engine init failed: " << err << "\n";
        return 1;
      }
      tf_handles.push_back(handle);
      forwards.push_back([tf_lib, handle](
                             const std::vector<float>& m,
                             const std::vector<float>& a,
                             const std::vector<float>& b,
                             std::vector<std::vector<float>>* o) {
        char ferr[1024] = {0};
        int streams =
            tf_lib->forward(handle, m.data(), m.size(), a.data(), a.size(),
                            b.data(), b.size(), ferr, sizeof(ferr));
        if (streams == 0) {
          std::cerr << "TF engine forward failed: " << ferr << "\n";
          std::exit(1);
        }
        o->clear();
        for (int i = 0; i < streams; ++i) {
          int len = 0;
          const float* data = tf_lib->output(handle, i, &len);
          o->emplace_back(data, data + len);
        }
      });
    }
    engine_sr = tf_lib->sample_rate(tf_handles[0]);
    std::printf("engine: tensorflow (python-free), %d worker(s)\n",
                num_threads);
  } else {
    py_engine = std::make_unique<wesep::SeparateEngine>(
        flags.model_path, flags.feat_dim, flags.sample_rate);
    engine_sr = py_engine->sample_rate();
    forwards.push_back([&py_engine](const std::vector<float>& m,
                                    const std::vector<float>& a,
                                    const std::vector<float>& b,
                                    std::vector<std::vector<float>>* o) {
      py_engine->ForwardFunc(m, a, b, o);
    });
  }

  std::atomic<size_t> next_utt{0};
  std::atomic<long> total_decode_ms{0};
  std::mutex io_mu;
  double total_audio_sec = 0.0;
  wesep::Timer wall;

  auto worker = [&](int tid) {
    for (;;) {
      size_t idx = next_utt.fetch_add(1);
      if (idx >= utts.size()) break;
      const auto& utt = utts[idx];
      const std::string& key = utt[0];
      wesep::WavReader mix_reader(utt[1]);
      wesep::WavReader e1_reader(utt[2]);
      wesep::WavReader e2_reader(utt[3]);
      std::vector<float> mix = Mono(mix_reader);
      std::vector<float> e1 = Mono(e1_reader);
      std::vector<float> e2 = Mono(e2_reader);
      double audio_sec =
          static_cast<double>(mix.size()) / mix_reader.sample_rate();

      wesep::Timer timer;
      std::vector<std::vector<float>> outputs;
      forwards[tid](mix, e1, e2, &outputs);
      long ms = timer.Elapsed();
      total_decode_ms += ms;
      double rtf = (ms / 1000.0) / audio_sec;
      {
        std::lock_guard<std::mutex> lock(io_mu);
        total_audio_sec += audio_sec;
        std::printf("%s: decode %ld ms, audio %.2f s, RTF %.4f\n",
                    key.c_str(), ms, audio_sec, rtf);
      }
      for (size_t i = 0; i < outputs.size(); ++i) {
        std::string out_path = flags.result_dir + "/" + key + "-spk" +
                               std::to_string(i + 1) + ".wav";
        wesep::WriteWavFile(out_path, outputs[i].data(), outputs[i].size(),
                            engine_sr);
      }
    }
  };

  if (num_threads == 1) {
    worker(0);
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < num_threads; ++t) pool.emplace_back(worker, t);
    for (auto& th : pool) th.join();
  }
  long wall_ms = wall.Elapsed();
  if (total_audio_sec > 0) {
    std::printf("TOTAL: decode %ld ms, audio %.2f s, RTF %.4f\n",
                total_decode_ms.load(), total_audio_sec,
                (total_decode_ms.load() / 1000.0) / total_audio_sec);
    if (num_threads > 1) {
      std::printf("WALL: %ld ms, throughput RTF %.4f (%d workers)\n",
                  wall_ms, (wall_ms / 1000.0) / total_audio_sec,
                  num_threads);
    }
  }
  for (void* h : tf_handles) tf_lib->destroy(h);
  return 0;
}
