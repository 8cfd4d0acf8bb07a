// Target-speaker-extraction serving engine.
// TPU-native counterpart of the reference LibTorch engine
// (/root/reference/runtime/separate/separate_engine.{h,cc}): the C++ side
// owns wav decoding, the streaming fbank frontend and batching; the model
// itself is the XLA-compiled executable reached through an embedded
// CPython interpreter (wesep_tpu.runtime_host).
#ifndef WESEP_TPU_RUNTIME_SEPARATE_SEPARATE_ENGINE_H_
#define WESEP_TPU_RUNTIME_SEPARATE_SEPARATE_ENGINE_H_

#include <string>
#include <vector>

namespace wesep {

class SeparateEngine {
 public:
  // model_path: export dir (model.stablehlo + model.ckpt + export.json)
  // or model dir (config.yaml + avg_model.ckpt).
  SeparateEngine(const std::string& model_path, int feat_dim,
                 int sample_rate);
  ~SeparateEngine();
  SeparateEngine(const SeparateEngine&) = delete;
  SeparateEngine& operator=(const SeparateEngine&) = delete;

  // Streaming fbank + per-utterance mean normalization for one
  // enrollment (reference ExtractFeature, separate_engine.cc:53-74).
  // Returns frames x feat_dim row-major.
  std::vector<float> ExtractFeature(const std::vector<float>& wav,
                                    int* num_frames) const;

  // mix + two enrollment wavs -> two estimated wavs [2][T]
  // (reference ForwardFunc, separate_engine.cc:76-123).
  void ForwardFunc(const std::vector<float>& mix,
                   const std::vector<float>& enroll1,
                   const std::vector<float>& enroll2,
                   std::vector<std::vector<float>>* outputs);

  int sample_rate() const { return sample_rate_; }

 private:
  bool expects_fbank_ = false;
  int feat_dim_;
  int sample_rate_;
  void* host_module_ = nullptr;  // PyObject*
};

}  // namespace wesep

#endif  // WESEP_TPU_RUNTIME_SEPARATE_SEPARATE_ENGINE_H_
