// Python-free serving engine: runs the exported TF SavedModel
// (jax2tf-serialized StableHLO, bin/export.py --format savedmodel)
// through the TensorFlow C API. Unlike SeparateEngine (embedded
// CPython), this path has NO Python dependency at serving time — the
// self-contained counterpart of the reference's LibTorch engine
// (/root/reference/runtime/separate/separate_engine.cc:31-35).
#ifndef WESEP_TPU_RUNTIME_SEPARATE_TF_ENGINE_H_
#define WESEP_TPU_RUNTIME_SEPARATE_TF_ENGINE_H_

#include <string>
#include <vector>

namespace wesep {

class TfSeparateEngine {
 public:
  // saved_model_dir: .../saved_model (contains saved_model.pb +
  // wesep_manifest.json with the export shapes).
  TfSeparateEngine(const std::string& saved_model_dir, int feat_dim,
                   int sample_rate);
  ~TfSeparateEngine();
  TfSeparateEngine(const TfSeparateEngine&) = delete;
  TfSeparateEngine& operator=(const TfSeparateEngine&) = delete;

  std::vector<float> ExtractFeature(const std::vector<float>& wav,
                                    int* num_frames) const;

  void ForwardFunc(const std::vector<float>& mix,
                   const std::vector<float>& enroll1,
                   const std::vector<float>& enroll2,
                   std::vector<std::vector<float>>* outputs);

  int sample_rate() const { return sample_rate_; }

 private:
  // one static-shape session run: mix_rows [b*t_len] -> est_rows
  void RunWindow(const std::vector<float>& mix_rows,
                 const std::vector<float>& enroll_rows,
                 std::vector<float>* est_rows);

  struct Impl;
  Impl* impl_;
  bool expects_fbank_ = false;
  int feat_dim_;
  int sample_rate_;
  // export-time static shapes (inputs are padded/trimmed to these)
  int mix_batch_ = 2;
  int mix_samples_ = 0;
  std::vector<int> enroll_shape_;
};

}  // namespace wesep

#endif  // WESEP_TPU_RUNTIME_SEPARATE_TF_ENGINE_H_
