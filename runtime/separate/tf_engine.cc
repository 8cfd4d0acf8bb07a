#include "separate/tf_engine.h"

#include <algorithm>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

#include "tensorflow/c/c_api.h"

#include "frontend/feature_pipeline.h"

namespace wesep {

namespace {

void CheckStatus(TF_Status* status, const char* what) {
  if (TF_GetCode(status) != TF_OK) {
    throw std::runtime_error(std::string(what) + ": " +
                             TF_Message(status));
  }
}

void NoOpDeallocator(void*, size_t, void*) {}

TF_Tensor* MakeTensor(const std::vector<int64_t>& dims,
                      const float* data, size_t n) {
  TF_Tensor* t = TF_AllocateTensor(
      TF_FLOAT, dims.data(), static_cast<int>(dims.size()),
      n * sizeof(float));
  std::memcpy(TF_TensorData(t), data, n * sizeof(float));
  return t;
}

}  // namespace

struct TfSeparateEngine::Impl {
  TF_Graph* graph = nullptr;
  TF_Session* session = nullptr;
  TF_Status* status = nullptr;
  TF_Output in_mix;
  TF_Output in_enroll;
  TF_Output out_est;
};

TfSeparateEngine::TfSeparateEngine(const std::string& saved_model_dir,
                                   int feat_dim, int sample_rate)
    : impl_(new Impl), feat_dim_(feat_dim), sample_rate_(sample_rate) {
  // manifest: export-time shapes + model kind
  std::ifstream mf(saved_model_dir + "/wesep_manifest.txt");
  if (!mf) {
    throw std::runtime_error("missing wesep_manifest.txt in " +
                             saved_model_dir);
  }
  std::string line;
  while (std::getline(mf, line)) {
    std::istringstream iss(line);
    std::string key;
    iss >> key;
    if (key == "sample_rate") {
      iss >> sample_rate_;
    } else if (key == "speaker_feat") {
      int v;
      iss >> v;
      expects_fbank_ = v != 0;
    } else if (key == "mix_batch") {
      iss >> mix_batch_;
    } else if (key == "mix_samples") {
      iss >> mix_samples_;
    } else if (key == "enroll_shape") {
      int d;
      while (iss >> d) enroll_shape_.push_back(d);
    }
  }
  if (mix_samples_ <= 0 || enroll_shape_.empty()) {
    throw std::runtime_error("incomplete wesep_manifest.txt");
  }

  impl_->status = TF_NewStatus();
  impl_->graph = TF_NewGraph();
  TF_SessionOptions* opts = TF_NewSessionOptions();
  const char* tags[] = {"serve"};
  impl_->session = TF_LoadSessionFromSavedModel(
      opts, nullptr, saved_model_dir.c_str(), tags, 1, impl_->graph,
      nullptr, impl_->status);
  TF_DeleteSessionOptions(opts);
  CheckStatus(impl_->status, "TF_LoadSessionFromSavedModel");

  auto find = [&](const char* name) -> TF_Output {
    TF_Operation* op = TF_GraphOperationByName(impl_->graph, name);
    if (op == nullptr) {
      throw std::runtime_error(
          std::string("op not found in SavedModel graph: ") + name);
    }
    return TF_Output{op, 0};
  };
  // tf.saved_model serving_default signature naming convention
  impl_->in_mix = find("serving_default_mix");
  impl_->in_enroll = find("serving_default_enroll");
  impl_->out_est = find("StatefulPartitionedCall");
}

TfSeparateEngine::~TfSeparateEngine() {
  if (impl_->session != nullptr) {
    TF_CloseSession(impl_->session, impl_->status);
    TF_DeleteSession(impl_->session, impl_->status);
  }
  if (impl_->graph != nullptr) TF_DeleteGraph(impl_->graph);
  if (impl_->status != nullptr) TF_DeleteStatus(impl_->status);
  delete impl_;
}

std::vector<float> TfSeparateEngine::ExtractFeature(
    const std::vector<float>& wav, int* num_frames) const {
  FeaturePipelineConfig config;
  config.num_bins = feat_dim_;
  config.sample_rate = sample_rate_;
  FeaturePipeline pipeline(config);
  pipeline.AcceptWaveform(wav.data(), wav.size());
  pipeline.SetInputFinished();
  std::vector<float> feats;
  int frames = pipeline.ReadAll(&feats);
  if (frames > 0) {
    for (int d = 0; d < feat_dim_; ++d) {
      float mean = 0.0f;
      for (int t = 0; t < frames; ++t) mean += feats[t * feat_dim_ + d];
      mean /= frames;
      for (int t = 0; t < frames; ++t) feats[t * feat_dim_ + d] -= mean;
    }
  }
  *num_frames = frames;
  return feats;
}

void TfSeparateEngine::RunWindow(const std::vector<float>& mix_rows,
                                 const std::vector<float>& enroll_rows,
                                 std::vector<float>* est_rows) {
  const int b = mix_batch_;
  const size_t t_len = static_cast<size_t>(mix_samples_);
  std::vector<int64_t> mix_dims = {b, static_cast<int64_t>(t_len)};
  std::vector<int64_t> enroll_dims(enroll_shape_.begin(),
                                   enroll_shape_.end());
  TF_Tensor* in_tensors[2] = {
      MakeTensor(mix_dims, mix_rows.data(), mix_rows.size()),
      MakeTensor(enroll_dims, enroll_rows.data(), enroll_rows.size()),
  };
  TF_Output inputs[2] = {impl_->in_mix, impl_->in_enroll};
  TF_Output out[1] = {impl_->out_est};
  TF_Tensor* out_tensor = nullptr;

  TF_SessionRun(impl_->session, nullptr, inputs, in_tensors, 2, out,
                &out_tensor, 1, nullptr, 0, nullptr, impl_->status);
  TF_DeleteTensor(in_tensors[0]);
  TF_DeleteTensor(in_tensors[1]);
  CheckStatus(impl_->status, "TF_SessionRun");

  const float* est = static_cast<const float*>(TF_TensorData(out_tensor));
  est_rows->assign(est, est + b * t_len);
  TF_DeleteTensor(out_tensor);
}

void TfSeparateEngine::ForwardFunc(
    const std::vector<float>& mix, const std::vector<float>& enroll1,
    const std::vector<float>& enroll2,
    std::vector<std::vector<float>>* outputs) {
  const int b = mix_batch_;
  const size_t t_len = static_cast<size_t>(mix_samples_);
  const size_t t_in = mix.size();

  // enrollment rows: fbank features or raw wavs, padded/trimmed to the
  // export enrollment shape; computed once regardless of mixture length
  size_t enroll_row = 1;
  for (size_t i = 1; i < enroll_shape_.size(); ++i) {
    enroll_row *= static_cast<size_t>(enroll_shape_[i]);
  }
  std::vector<float> enroll_rows(b * enroll_row, 0.0f);
  const std::vector<float>* enrolls[2] = {&enroll1, &enroll2};
  for (int r = 0; r < b && r < 2; ++r) {
    std::vector<float> row;
    if (expects_fbank_) {
      int frames = 0;
      row = ExtractFeature(*enrolls[r], &frames);
    } else {
      row = *enrolls[r];
    }
    const size_t n = row.size() < enroll_row ? row.size() : enroll_row;
    std::memcpy(enroll_rows.data() + r * enroll_row, row.data(),
                n * sizeof(float));
  }

  // The graph has static XLA shapes [b, t_len]. Short inputs are
  // zero-padded and trimmed back. Long inputs are processed as
  // overlapping t_len windows of FULL-LENGTH real audio — the last
  // window anchored at t_in - t_len, matching the Python
  // Extractor._decode "starts + [t - win]" scheme — cross-faded with
  // strictly positive trapezoid weights and normalized by the weight
  // sum. The reference LibTorch engine instead reruns its dynamic
  // graph per length (separate_engine.cc ForwardFunc), which
  // static-shape XLA serving cannot do.
  std::vector<float> mix_rows(b * t_len);
  std::vector<float> est_rows;

  if (t_in <= t_len) {
    std::fill(mix_rows.begin(), mix_rows.end(), 0.0f);
    for (int r = 0; r < b; ++r) {
      std::memcpy(mix_rows.data() + r * t_len, mix.data(),
                  t_in * sizeof(float));
    }
    RunWindow(mix_rows, enroll_rows, &est_rows);
    outputs->clear();
    for (int r = 0; r < b; ++r) {
      outputs->emplace_back(est_rows.begin() + r * t_len,
                            est_rows.begin() + r * t_len + t_in);
    }
    (void)NoOpDeallocator;
    return;
  }

  const size_t overlap =
      t_len >= 4 ? std::min(t_len / 4, static_cast<size_t>(sample_rate_))
                 : 0;
  const size_t hop = t_len > overlap ? t_len - overlap : 1;

  std::vector<float> window(t_len, 1.0f);
  for (size_t i = 0; i < overlap; ++i) {
    const float w = static_cast<float>(i + 1) / static_cast<float>(overlap + 1);
    window[i] = w;
    window[t_len - 1 - i] = w;
  }

  std::vector<std::vector<float>> acc(b, std::vector<float>(t_in, 0.0f));
  std::vector<float> wsum(t_in, 0.0f);
  std::vector<size_t> starts;
  for (size_t s = 0; s + t_len < t_in; s += hop) starts.push_back(s);
  starts.push_back(t_in - t_len);  // anchored: tail decoded with real context

  for (const size_t start : starts) {
    for (int r = 0; r < b; ++r) {
      std::memcpy(mix_rows.data() + r * t_len, mix.data() + start,
                  t_len * sizeof(float));
    }
    RunWindow(mix_rows, enroll_rows, &est_rows);
    for (size_t i = 0; i < t_len; ++i) {
      const float w = window[i];
      for (int r = 0; r < b; ++r) {
        acc[r][start + i] += est_rows[r * t_len + i] * w;
      }
      wsum[start + i] += w;
    }
  }

  outputs->clear();
  for (int r = 0; r < b; ++r) {
    for (size_t i = 0; i < t_in; ++i) {
      acc[r][i] /= std::max(wsum[i], 1e-12f);
    }
    outputs->push_back(std::move(acc[r]));
  }
  (void)NoOpDeallocator;
}

}  // namespace wesep

// C ABI for dlopen-based loading. separate_main must NOT link TF
// directly: libtensorflow's absl/protobuf symbols clash with jaxlib's
// when the embedded-CPython engine later imports jax in the same
// process (segfault). The TF engine therefore lives in its own shared
// object, mapped only when the user actually passes a SavedModel.
extern "C" {

struct WesepTfHandle {
  wesep::TfSeparateEngine* engine;
  std::vector<std::vector<float>> outputs;
};

void* wesep_tf_engine_create(const char* saved_model_dir, int feat_dim,
                             int sample_rate, char* err, int err_len) {
  try {
    auto* h = new WesepTfHandle;
    h->engine =
        new wesep::TfSeparateEngine(saved_model_dir, feat_dim, sample_rate);
    return h;
  } catch (const std::exception& e) {
    if (err != nullptr && err_len > 0) {
      std::snprintf(err, err_len, "%s", e.what());
    }
    return nullptr;
  }
}

int wesep_tf_engine_sample_rate(void* handle) {
  return static_cast<WesepTfHandle*>(handle)->engine->sample_rate();
}

// Runs the model; returns the number of output streams (0 on error).
// Stream data stays owned by the handle until the next forward call.
int wesep_tf_engine_forward(void* handle, const float* mix, int mix_len,
                            const float* e1, int e1_len, const float* e2,
                            int e2_len, char* err, int err_len) {
  auto* h = static_cast<WesepTfHandle*>(handle);
  try {
    std::vector<float> m(mix, mix + mix_len);
    std::vector<float> a(e1, e1 + e1_len);
    std::vector<float> b(e2, e2 + e2_len);
    h->engine->ForwardFunc(m, a, b, &h->outputs);
    return static_cast<int>(h->outputs.size());
  } catch (const std::exception& e) {
    if (err != nullptr && err_len > 0) {
      std::snprintf(err, err_len, "%s", e.what());
    }
    return 0;
  }
}

const float* wesep_tf_engine_output(void* handle, int i, int* len) {
  auto* h = static_cast<WesepTfHandle*>(handle);
  *len = static_cast<int>(h->outputs[i].size());
  return h->outputs[i].data();
}

void wesep_tf_engine_destroy(void* handle) {
  auto* h = static_cast<WesepTfHandle*>(handle);
  delete h->engine;
  delete h;
}

}  // extern "C"
