#include "separate/separate_engine.h"

#include <Python.h>

#include <cstring>
#include <stdexcept>

#include "frontend/feature_pipeline.h"

namespace wesep {

namespace {

void EnsurePython() {
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    // repo root + optional extra paths from WESEP_PYTHONPATH
    PyRun_SimpleString(
        "import sys, os\n"
        "for p in os.environ.get('WESEP_PYTHONPATH', '').split(':'):\n"
        "    if p and p not in sys.path:\n"
        "        sys.path.insert(0, p)\n");
  }
}

void Check(PyObject* obj, const char* what) {
  if (obj == nullptr) {
    PyErr_Print();
    throw std::runtime_error(std::string("python error in ") + what);
  }
}

// Zero-copy view of a C float buffer as a 1-D numpy array: memoryview ->
// np.frombuffer shares the memory, no per-sample boxing (the reference
// LibTorch engine gets the same via torch::from_blob). The caller's
// buffer must outlive every python use of the array; runtime_host copies
// into batch tensors before returning, so the lifetime ends with the
// separate() call.
PyObject* ArrayFromBuffer(PyObject* np, const float* data, size_t n) {
  PyObject* mv = PyMemoryView_FromMemory(
      reinterpret_cast<char*>(const_cast<float*>(data)),
      static_cast<Py_ssize_t>(n * sizeof(float)), PyBUF_READ);
  Check(mv, "memoryview");
  PyObject* arr = PyObject_CallMethod(np, "frombuffer", "Os", mv, "float32");
  Py_DECREF(mv);
  Check(arr, "np.frombuffer");
  return arr;
}

}  // namespace

SeparateEngine::SeparateEngine(const std::string& model_path, int feat_dim,
                               int sample_rate)
    : feat_dim_(feat_dim), sample_rate_(sample_rate) {
  EnsurePython();
  PyObject* mod = PyImport_ImportModule("wesep_tpu.runtime_host");
  Check(mod, "import wesep_tpu.runtime_host");
  host_module_ = mod;
  PyObject* ret = PyObject_CallMethod(mod, "load", "s", model_path.c_str());
  Check(ret, "runtime_host.load");
  sample_rate_ = static_cast<int>(PyLong_AsLong(ret));
  Py_DECREF(ret);
  PyObject* fb = PyObject_CallMethod(mod, "expects_fbank", nullptr);
  Check(fb, "runtime_host.expects_fbank");
  expects_fbank_ = PyObject_IsTrue(fb) == 1;
  Py_DECREF(fb);
}

SeparateEngine::~SeparateEngine() {
  Py_XDECREF(reinterpret_cast<PyObject*>(host_module_));
}

std::vector<float> SeparateEngine::ExtractFeature(
    const std::vector<float>& wav, int* num_frames) const {
  FeaturePipelineConfig config;
  config.num_bins = feat_dim_;
  config.sample_rate = sample_rate_;
  FeaturePipeline pipeline(config);
  pipeline.AcceptWaveform(wav.data(), wav.size());
  pipeline.SetInputFinished();
  std::vector<float> feats;
  int frames = pipeline.ReadAll(&feats);
  // per-utterance mean normalization over time (reference
  // separate_engine.cc:66-73)
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

void SeparateEngine::ForwardFunc(const std::vector<float>& mix,
                                 const std::vector<float>& enroll1,
                                 const std::vector<float>& enroll2,
                                 std::vector<std::vector<float>>* outputs) {
  PyObject* mod = reinterpret_cast<PyObject*>(host_module_);
  PyObject* np = PyImport_ImportModule("numpy");
  Check(np, "import numpy");

  auto make_array = [&](const std::vector<float>& data, int rows,
                        int cols) -> PyObject* {
    PyObject* arr = ArrayFromBuffer(np, data.data(), data.size());
    if (rows > 0) {
      PyObject* shaped =
          PyObject_CallMethod(arr, "reshape", "(ii)", rows, cols);
      Py_DECREF(arr);
      Check(shaped, "reshape");
      return shaped;
    }
    return arr;
  };

  PyObject* mix_arr = make_array(mix, 0, 0);
  PyObject *e1_arr, *e2_arr;
  if (expects_fbank_) {
    int n1 = 0, n2 = 0;
    std::vector<float> f1 = ExtractFeature(enroll1, &n1);
    std::vector<float> f2 = ExtractFeature(enroll2, &n2);
    e1_arr = make_array(f1, n1, feat_dim_);
    e2_arr = make_array(f2, n2, feat_dim_);
  } else {
    e1_arr = make_array(enroll1, 0, 0);
    e2_arr = make_array(enroll2, 0, 0);
  }

  PyObject* ret = PyObject_CallMethod(mod, "separate", "OOO", mix_arr,
                                      e1_arr, e2_arr);
  Py_DECREF(mix_arr);
  Py_DECREF(e1_arr);
  Py_DECREF(e2_arr);
  Check(ret, "runtime_host.separate");

  // ret: np.ndarray [N, T] float32 -> one bulk memcpy per row via the
  // buffer protocol (the reverse of ArrayFromBuffer; no boxed floats)
  outputs->clear();
  PyObject* contig =
      PyObject_CallMethod(np, "ascontiguousarray", "Os", ret, "float32");
  Py_DECREF(ret);
  Check(contig, "ascontiguousarray");
  Py_buffer view;
  if (PyObject_GetBuffer(contig, &view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) !=
      0) {
    PyErr_Print();
    Py_DECREF(contig);
    throw std::runtime_error("separate output does not expose a buffer");
  }
  if (view.ndim != 2) {
    PyBuffer_Release(&view);
    Py_DECREF(contig);
    throw std::runtime_error("separate output is not 2-D");
  }
  const Py_ssize_t n_out = view.shape[0];
  const Py_ssize_t t = view.shape[1];
  const float* src = static_cast<const float*>(view.buf);
  for (Py_ssize_t i = 0; i < n_out; ++i) {
    std::vector<float> out(static_cast<size_t>(t));
    std::memcpy(out.data(), src + i * t, static_cast<size_t>(t) * sizeof(float));
    outputs->push_back(std::move(out));
  }
  PyBuffer_Release(&view);
  Py_DECREF(contig);
  Py_DECREF(np);
}

}  // namespace wesep
