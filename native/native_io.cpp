// Native IO for loam_livox_tpu — the C++ data-loader layer.
//
// The reference's ingest path is native C++ end to end (ROS TCPROS
// deserialization into PCL clouds + subscriber queues with a
// drop-oldest policy, laser_mapping.hpp:1697-1707).  The TPU engine's
// device side is XLA, but the host-side frame feed is the same kind of
// latency-sensitive native work: this module provides
//
//   * decode_pcd(bytes)        — binary/ascii PCD → contiguous float32
//                                arrays (zero extra copies for binary),
//   * FrameQueue               — a bounded, threaded prefetch queue over
//                                a list of PCD files with the
//                                reference's drop-oldest backpressure
//                                (maximum_mapping_buffer semantics).
//
// Build: python native/setup.py build_ext --inplace   (see setup.py)
// The Python wrapper (loam_livox_tpu.io.native) falls back to the pure
// Python decoder when the extension is absent.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Cloud {
    std::vector<float> xyz;        // 3 * n
    std::vector<float> intensity;  // n or empty
    int64_t n = 0;
    bool ok = false;
    std::string err;
};

// ---------------------------------------------------------------------------
// PCD decoding
// ---------------------------------------------------------------------------

// Read one scalar of the given TYPE/SIZE at p as float.  Returns false
// for unsupported layouts (callers surface a decode error rather than
// reinterpreting bytes as the wrong type).
bool read_scalar(const char* p, char type, int size, float* v) {
    if (type == 'F' && size == 4) {
        std::memcpy(v, p, 4);
        return true;
    }
    if (type == 'F' && size == 8) {
        double d;
        std::memcpy(&d, p, 8);
        *v = (float)d;
        return true;
    }
    if (type == 'U' || type == 'I') {
        int64_t raw = 0;
        if (size == 1 || size == 2 || size == 4) {
            std::memcpy(&raw, p, size);
            if (type == 'I') {  // sign-extend
                int shift = 64 - size * 8;
                raw = (raw << shift) >> shift;
            }
            *v = (float)raw;
            return true;
        }
    }
    return false;
}

Cloud decode_pcd_buffer_impl(const char* data, size_t len) {
    Cloud out;
    // parse header lines until DATA
    size_t pos = 0;
    std::vector<std::string> fields;
    std::vector<int> sizes, counts;
    std::vector<char> types;
    long npoints = -1;
    std::string mode;
    while (pos < len) {
        size_t eol = pos;
        while (eol < len && data[eol] != '\n') eol++;
        std::string line(data + pos, eol - pos);
        pos = eol + 1;
        std::istringstream ss(line);
        std::string key;
        ss >> key;
        if (key == "FIELDS") {
            std::string f;
            while (ss >> f) fields.push_back(f);
        } else if (key == "SIZE") {
            int v;
            while (ss >> v) sizes.push_back(v);
        } else if (key == "TYPE") {
            char t;
            while (ss >> t) types.push_back(t);
        } else if (key == "COUNT") {
            int v;
            while (ss >> v) counts.push_back(v);
        } else if (key == "POINTS") {
            ss >> npoints;
        } else if (key == "DATA") {
            ss >> mode;
            break;
        }
    }
    if (npoints < 0 || fields.empty()) {
        out.err = "bad PCD header";
        return out;
    }
    if (counts.empty()) counts.assign(fields.size(), 1);
    if (sizes.empty()) sizes.assign(fields.size(), 4);
    if (types.empty()) types.assign(fields.size(), 'F');
    if (sizes.size() != fields.size() || types.size() != fields.size() ||
        counts.size() != fields.size()) {
        out.err = "PCD header FIELDS/SIZE/TYPE/COUNT length mismatch";
        return out;
    }

    int xi = -1, yi = -1, zi = -1, ii = -1;
    int stride = 0;                 // bytes per point
    std::vector<int> offsets(fields.size());
    for (size_t f = 0; f < fields.size(); f++) {
        offsets[f] = stride;
        stride += sizes[f] * counts[f];
        if (fields[f] == "x") xi = (int)f;
        else if (fields[f] == "y") yi = (int)f;
        else if (fields[f] == "z") zi = (int)f;
        else if (fields[f] == "intensity") ii = (int)f;
    }
    if (xi < 0 || yi < 0 || zi < 0) {
        out.err = "PCD missing x/y/z";
        return out;
    }

    if (mode == "binary") {
        // Bound npoints by the actual payload BEFORE any allocation —
        // a corrupt POINTS value must not drive a multi-GB resize.
        if (stride <= 0 || pos > len ||
            (size_t)npoints > (len - pos) / (size_t)stride) {
            out.err = "truncated binary PCD payload";
            return out;
        }
    } else if ((size_t)npoints > len) {  // ascii needs ≥1 byte per point
        out.err = "truncated ascii PCD payload";
        return out;
    }
    out.n = npoints;
    out.xyz.resize((size_t)npoints * 3);
    if (ii >= 0) out.intensity.resize((size_t)npoints);

    if (mode == "binary") {
        const char* p = data + pos;
        for (long i = 0; i < npoints; i++, p += stride) {
            bool ok3 =
                read_scalar(p + offsets[xi], types[xi], sizes[xi],
                            &out.xyz[i * 3 + 0]) &&
                read_scalar(p + offsets[yi], types[yi], sizes[yi],
                            &out.xyz[i * 3 + 1]) &&
                read_scalar(p + offsets[zi], types[zi], sizes[zi],
                            &out.xyz[i * 3 + 2]);
            if (ii >= 0)
                ok3 = ok3 && read_scalar(p + offsets[ii], types[ii],
                                         sizes[ii], &out.intensity[i]);
            if (!ok3) {
                out = Cloud();
                out.err = "unsupported PCD field TYPE/SIZE";
                return out;
            }
        }
    } else {  // ascii
        std::istringstream body(std::string(data + pos, len - pos));
        std::vector<double> row(fields.size());
        for (long i = 0; i < npoints; i++) {
            for (size_t f = 0; f < fields.size(); f++) {
                if (!(body >> row[f])) {
                    out.err = "truncated ascii PCD payload";
                    return out;
                }
            }
            out.xyz[i * 3 + 0] = (float)row[xi];
            out.xyz[i * 3 + 1] = (float)row[yi];
            out.xyz[i * 3 + 2] = (float)row[zi];
            if (ii >= 0) out.intensity[i] = (float)row[ii];
        }
    }
    out.ok = true;
    return out;
}

// Exception firewall: decode runs with the GIL released, so an escaping
// bad_alloc/length_error would terminate the process instead of raising.
Cloud decode_pcd_buffer(const char* data, size_t len) {
    try {
        return decode_pcd_buffer_impl(data, len);
    } catch (const std::exception& e) {
        Cloud c;
        c.err = std::string("PCD decode failed: ") + e.what();
        return c;
    }
}

Cloud decode_pcd_file(const std::string& path) {
    std::ifstream f(path, std::ios::binary);
    if (!f) {
        Cloud c;
        c.err = "cannot open " + path;
        return c;
    }
    std::string buf((std::istreambuf_iterator<char>(f)),
                    std::istreambuf_iterator<char>());
    return decode_pcd_buffer(buf.data(), buf.size());
}

PyObject* cloud_to_py(const Cloud& c) {
    if (!c.ok) {
        PyErr_SetString(PyExc_ValueError, c.err.c_str());
        return nullptr;
    }
    npy_intp dims[2] = {(npy_intp)c.n, 3};
    PyObject* xyz = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
    if (!xyz) return nullptr;
    std::memcpy(PyArray_DATA((PyArrayObject*)xyz), c.xyz.data(),
                c.xyz.size() * sizeof(float));
    PyObject* inten;
    if (!c.intensity.empty()) {
        npy_intp d1[1] = {(npy_intp)c.n};
        inten = PyArray_SimpleNew(1, d1, NPY_FLOAT32);
        if (!inten) {
            Py_DECREF(xyz);
            return nullptr;
        }
        std::memcpy(PyArray_DATA((PyArrayObject*)inten), c.intensity.data(),
                    c.intensity.size() * sizeof(float));
    } else {
        inten = Py_None;
        Py_INCREF(Py_None);
    }
    PyObject* tup = PyTuple_Pack(2, xyz, inten);
    Py_DECREF(xyz);
    Py_DECREF(inten);
    return tup;
}

PyObject* py_decode_pcd(PyObject*, PyObject* args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
    Cloud c;
    Py_BEGIN_ALLOW_THREADS
    c = decode_pcd_buffer((const char*)buf.buf, (size_t)buf.len);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    return cloud_to_py(c);
}

PyObject* py_decode_pcd_file(PyObject*, PyObject* args) {
    const char* path;
    if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
    Cloud c;
    Py_BEGIN_ALLOW_THREADS
    c = decode_pcd_file(path);
    Py_END_ALLOW_THREADS
    return cloud_to_py(c);
}

// ---------------------------------------------------------------------------
// FrameQueue: threaded prefetch with drop-oldest backpressure
// ---------------------------------------------------------------------------

struct FrameQueueObject {
    PyObject_HEAD
    std::vector<std::string>* files;
    std::deque<Cloud>* queue;
    std::mutex* mu;
    std::condition_variable* cv;
    std::thread* worker;
    std::atomic<bool>* stop;
    std::atomic<long>* dropped;
    size_t capacity;
    size_t next_file;
    bool done;
};

void frame_queue_worker(FrameQueueObject* self) {
    for (size_t i = 0; i < self->files->size(); i++) {
        if (self->stop->load()) return;
        Cloud c = decode_pcd_file((*self->files)[i]);
        std::unique_lock<std::mutex> lk(*self->mu);
        if (self->queue->size() >= self->capacity) {
            // drop-oldest (reference laser_mapping.hpp:1702-1707)
            self->queue->pop_front();
            self->dropped->fetch_add(1);
        }
        self->queue->push_back(std::move(c));
        self->cv->notify_all();
    }
    {
        std::unique_lock<std::mutex> lk(*self->mu);
        self->done = true;
        self->cv->notify_all();
    }
}

PyObject* FrameQueue_new(PyTypeObject* type, PyObject*, PyObject*) {
    FrameQueueObject* self = (FrameQueueObject*)type->tp_alloc(type, 0);
    if (self) {
        self->files = nullptr;
        self->queue = nullptr;
        self->mu = nullptr;
        self->cv = nullptr;
        self->worker = nullptr;
        self->stop = nullptr;
        self->dropped = nullptr;
        self->capacity = 0;
        self->next_file = 0;
        self->done = false;
    }
    return (PyObject*)self;
}

int FrameQueue_init(FrameQueueObject* self, PyObject* args, PyObject*) {
    PyObject* file_list;
    Py_ssize_t capacity = 64;
    if (!PyArg_ParseTuple(args, "O|n", &file_list, &capacity)) return -1;
    PyObject* seq = PySequence_Fast(file_list, "expected a sequence of paths");
    if (!seq) return -1;
    self->files = new std::vector<std::string>();
    for (Py_ssize_t i = 0; i < PySequence_Fast_GET_SIZE(seq); i++) {
        PyObject* item = PySequence_Fast_GET_ITEM(seq, i);
        const char* s = PyUnicode_AsUTF8(item);
        if (!s) {
            Py_DECREF(seq);
            return -1;
        }
        self->files->push_back(s);
    }
    Py_DECREF(seq);
    self->queue = new std::deque<Cloud>();
    self->mu = new std::mutex();
    self->cv = new std::condition_variable();
    self->stop = new std::atomic<bool>(false);
    self->dropped = new std::atomic<long>(0);
    self->capacity = (size_t)capacity;
    self->done = false;
    self->worker = new std::thread(frame_queue_worker, self);
    return 0;
}

void FrameQueue_dealloc(FrameQueueObject* self) {
    if (self->stop) self->stop->store(true);
    if (self->worker) {
        Py_BEGIN_ALLOW_THREADS
        if (self->worker->joinable()) self->worker->join();
        Py_END_ALLOW_THREADS
        delete self->worker;
    }
    delete self->files;
    delete self->queue;
    delete self->mu;
    delete self->cv;
    delete self->stop;
    delete self->dropped;
    Py_TYPE(self)->tp_free((PyObject*)self);
}

PyObject* FrameQueue_next_frame(FrameQueueObject* self, PyObject*) {
    Cloud c;
    bool have = false;
    Py_BEGIN_ALLOW_THREADS
    {
        std::unique_lock<std::mutex> lk(*self->mu);
        self->cv->wait(lk, [&] {
            return !self->queue->empty() || self->done || self->stop->load();
        });
        if (!self->queue->empty()) {
            c = std::move(self->queue->front());
            self->queue->pop_front();
            have = true;
        }
    }
    Py_END_ALLOW_THREADS
    if (!have) {
        Py_RETURN_NONE;  // stream exhausted
    }
    return cloud_to_py(c);
}

PyObject* FrameQueue_dropped(FrameQueueObject* self, PyObject*) {
    return PyLong_FromLong(self->dropped->load());
}

PyMethodDef FrameQueue_methods[] = {
    {"next_frame", (PyCFunction)FrameQueue_next_frame, METH_NOARGS,
     "Blocking pop of the next decoded frame; None when exhausted."},
    {"dropped", (PyCFunction)FrameQueue_dropped, METH_NOARGS,
     "Number of frames dropped by backpressure."},
    {nullptr, nullptr, 0, nullptr}};

PyTypeObject FrameQueueType = [] {
    PyTypeObject t = {PyVarObject_HEAD_INIT(nullptr, 0)};
    t.tp_name = "_native_io.FrameQueue";
    t.tp_basicsize = sizeof(FrameQueueObject);
    t.tp_flags = Py_TPFLAGS_DEFAULT;
    t.tp_doc = "Threaded PCD prefetch queue with drop-oldest backpressure";
    t.tp_new = FrameQueue_new;
    t.tp_init = (initproc)FrameQueue_init;
    t.tp_dealloc = (destructor)FrameQueue_dealloc;
    t.tp_methods = FrameQueue_methods;
    return t;
}();

PyMethodDef module_methods[] = {
    {"decode_pcd", py_decode_pcd, METH_VARARGS,
     "decode_pcd(bytes) -> (xyz float32 (N,3), intensity (N,) or None)"},
    {"decode_pcd_file", py_decode_pcd_file, METH_VARARGS,
     "decode_pcd_file(path) -> (xyz, intensity)"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_native_io",
                         "Native PCD decode + prefetch queue", -1,
                         module_methods};

}  // namespace

PyMODINIT_FUNC PyInit__native_io(void) {
    import_array();
    if (PyType_Ready(&FrameQueueType) < 0) return nullptr;
    PyObject* m = PyModule_Create(&moduledef);
    if (!m) return nullptr;
    Py_INCREF(&FrameQueueType);
    PyModule_AddObject(m, "FrameQueue", (PyObject*)&FrameQueueType);
    return m;
}
