// Native URDF parser for steppingstone_tpu.
//
// TPU-native replacement for the URDF ingestion the reference gets from
// PyBullet's C++ loader (SURVEY.md §2.10: robot descriptions enter through
// the missing mocca_envs submodule -> pybullet.loadURDF). This is a
// dependency-free single-file parser: a minimal XML DOM plus URDF
// link/joint/inertial/collision extraction, exposed through a flat C API
// consumed via ctypes (no pybind11 in this image).
//
// Build: make -C native   (g++ -O2 -fPIC -shared)

#include <array>
#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace {

// ----------------------------------------------------------------------
// Minimal XML DOM (elements + attributes; enough for URDF)
// ----------------------------------------------------------------------
struct XmlNode {
  std::string tag;
  std::map<std::string, std::string> attrs;
  std::vector<std::unique_ptr<XmlNode>> children;

  const XmlNode* child(const char* t) const {
    for (const auto& c : children)
      if (c->tag == t) return c.get();
    return nullptr;
  }
  std::vector<const XmlNode*> all(const char* t) const {
    std::vector<const XmlNode*> out;
    for (const auto& c : children)
      if (c->tag == t) out.push_back(c.get());
    return out;
  }
  std::string attr(const char* k, const std::string& dflt = "") const {
    auto it = attrs.find(k);
    return it == attrs.end() ? dflt : it->second;
  }
};

class XmlParser {
 public:
  XmlParser(const char* text) : p_(text) {}

  std::unique_ptr<XmlNode> parse(std::string* err) {
    skip_misc();
    auto root = parse_element(err);
    if (!root && err->empty()) *err = "no root element";
    return root;
  }

 private:
  const char* p_;

  void skip_ws() {
    while (*p_ && std::isspace((unsigned char)*p_)) ++p_;
  }

  void skip_misc() {  // whitespace, <?...?>, <!-- -->, <!DOCTYPE ...>
    for (;;) {
      skip_ws();
      if (std::strncmp(p_, "<?", 2) == 0) {
        const char* e = std::strstr(p_, "?>");
        if (!e) { p_ += std::strlen(p_); return; }
        p_ = e + 2;
      } else if (std::strncmp(p_, "<!--", 4) == 0) {
        const char* e = std::strstr(p_, "-->");
        if (!e) { p_ += std::strlen(p_); return; }
        p_ = e + 3;
      } else if (std::strncmp(p_, "<!", 2) == 0) {
        const char* e = std::strchr(p_, '>');
        if (!e) { p_ += std::strlen(p_); return; }
        p_ = e + 1;
      } else {
        return;
      }
    }
  }

  std::string parse_name() {
    std::string out;
    while (*p_ && (std::isalnum((unsigned char)*p_) || *p_ == '_' ||
                   *p_ == '-' || *p_ == ':' || *p_ == '.'))
      out += *p_++;
    return out;
  }

  std::unique_ptr<XmlNode> parse_element(std::string* err) {
    skip_misc();
    if (*p_ != '<') { *err = "expected '<'"; return nullptr; }
    ++p_;
    auto node = std::make_unique<XmlNode>();
    node->tag = parse_name();
    if (node->tag.empty()) { *err = "empty tag name"; return nullptr; }

    for (;;) {  // attributes
      skip_ws();
      if (*p_ == '/' && p_[1] == '>') { p_ += 2; return node; }
      if (*p_ == '>') { ++p_; break; }
      if (!*p_) { *err = "unexpected EOF in tag " + node->tag; return nullptr; }
      std::string key = parse_name();
      skip_ws();
      if (*p_ != '=') { *err = "expected '=' after attr " + key; return nullptr; }
      ++p_;
      skip_ws();
      char quote = *p_;
      if (quote != '"' && quote != '\'') { *err = "expected quote"; return nullptr; }
      ++p_;
      std::string val;
      while (*p_ && *p_ != quote) val += *p_++;
      if (!*p_) { *err = "unterminated attribute"; return nullptr; }
      ++p_;
      node->attrs[key] = val;
    }

    for (;;) {  // children / text / close tag
      skip_misc();
      if (!*p_) { *err = "unexpected EOF in element " + node->tag; return nullptr; }
      if (*p_ == '<' && p_[1] == '/') {
        p_ += 2;
        std::string close = parse_name();
        skip_ws();
        if (*p_ == '>') ++p_;
        if (close != node->tag) {
          *err = "mismatched close tag: " + close + " vs " + node->tag;
          return nullptr;
        }
        return node;
      }
      if (*p_ == '<') {
        auto c = parse_element(err);
        if (!c) return nullptr;
        node->children.push_back(std::move(c));
      } else {
        while (*p_ && *p_ != '<') ++p_;  // skip text content
      }
    }
  }
};

// ----------------------------------------------------------------------
// URDF extraction
// ----------------------------------------------------------------------
void parse_vec(const std::string& s, double* out, int n) {
  for (int i = 0; i < n; ++i) out[i] = 0.0;
  const char* c = s.c_str();
  for (int i = 0; i < n && *c; ++i) {
    char* end;
    out[i] = std::strtod(c, &end);
    if (end == c) break;
    c = end;
  }
}

struct Link {
  std::string name;
  double mass = 0.0;
  double com[3] = {0, 0, 0};
  double com_rpy[3] = {0, 0, 0};
  double inertia[6] = {0, 0, 0, 0, 0, 0};  // ixx iyy izz ixy ixz iyz
  // collision spheres: (x, y, z, r) each
  std::vector<std::array<double, 4>> spheres;
};

struct Joint {
  std::string name, type, parent, child;
  double xyz[3] = {0, 0, 0};
  double rpy[3] = {0, 0, 0};
  double axis[3] = {1, 0, 0};
  double lower = -3.14159265, upper = 3.14159265;
  double effort = 100.0, damping = 0.1;
};

struct Model {
  std::string name;
  std::vector<Link> links;
  std::vector<Joint> joints;
  std::string error;
};

Model* parse_urdf(const char* xml) {
  auto m = new Model();
  std::string err;
  XmlParser parser(xml);
  auto root = parser.parse(&err);
  if (!root) { m->error = err; return m; }
  if (root->tag != "robot") { m->error = "root element is not <robot>"; return m; }
  m->name = root->attr("name", "robot");

  for (const XmlNode* ln : root->all("link")) {
    Link link;
    link.name = ln->attr("name");
    if (const XmlNode* in = ln->child("inertial")) {
      if (const XmlNode* mass = in->child("mass"))
        link.mass = std::atof(mass->attr("value", "0").c_str());
      if (const XmlNode* orig = in->child("origin")) {
        parse_vec(orig->attr("xyz", "0 0 0"), link.com, 3);
        parse_vec(orig->attr("rpy", "0 0 0"), link.com_rpy, 3);
      }
      if (const XmlNode* iner = in->child("inertia")) {
        link.inertia[0] = std::atof(iner->attr("ixx", "0").c_str());
        link.inertia[1] = std::atof(iner->attr("iyy", "0").c_str());
        link.inertia[2] = std::atof(iner->attr("izz", "0").c_str());
        link.inertia[3] = std::atof(iner->attr("ixy", "0").c_str());
        link.inertia[4] = std::atof(iner->attr("ixz", "0").c_str());
        link.inertia[5] = std::atof(iner->attr("iyz", "0").c_str());
      }
    }
    for (const XmlNode* col : ln->all("collision")) {
      const XmlNode* geo = col->child("geometry");
      if (!geo) continue;
      const XmlNode* sph = geo->child("sphere");
      if (!sph) continue;  // only spheres become contact points
      double xyz[3] = {0, 0, 0};
      if (const XmlNode* orig = col->child("origin"))
        parse_vec(orig->attr("xyz", "0 0 0"), xyz, 3);
      double r = std::atof(sph->attr("radius", "0.02").c_str());
      link.spheres.push_back({xyz[0], xyz[1], xyz[2], r});
    }
    m->links.push_back(std::move(link));
  }

  for (const XmlNode* jn : root->all("joint")) {
    Joint j;
    j.name = jn->attr("name");
    j.type = jn->attr("type", "fixed");
    if (const XmlNode* p = jn->child("parent")) j.parent = p->attr("link");
    if (const XmlNode* c = jn->child("child")) j.child = c->attr("link");
    if (const XmlNode* o = jn->child("origin")) {
      parse_vec(o->attr("xyz", "0 0 0"), j.xyz, 3);
      parse_vec(o->attr("rpy", "0 0 0"), j.rpy, 3);
    }
    if (const XmlNode* a = jn->child("axis"))
      parse_vec(a->attr("xyz", "1 0 0"), j.axis, 3);
    if (const XmlNode* l = jn->child("limit")) {
      j.lower = std::atof(l->attr("lower", "-3.14159265").c_str());
      j.upper = std::atof(l->attr("upper", "3.14159265").c_str());
      j.effort = std::atof(l->attr("effort", "100").c_str());
    }
    if (j.type == "continuous") { j.lower = -31.4; j.upper = 31.4; }
    if (const XmlNode* d = jn->child("dynamics"))
      j.damping = std::atof(d->attr("damping", "0.1").c_str());
    m->joints.push_back(std::move(j));
  }
  return m;
}

void copy_str(const std::string& s, char* out, int n) {
  std::snprintf(out, n, "%s", s.c_str());
}

}  // namespace

// ----------------------------------------------------------------------
// C API (ctypes surface)
// ----------------------------------------------------------------------
extern "C" {

void* urdf_load(const char* xml) { return parse_urdf(xml); }
void urdf_free(void* h) { delete static_cast<Model*>(h); }

int urdf_error(void* h, char* buf, int n) {
  auto* m = static_cast<Model*>(h);
  if (m->error.empty()) return 0;
  copy_str(m->error, buf, n);
  return 1;
}

void urdf_name(void* h, char* buf, int n) {
  copy_str(static_cast<Model*>(h)->name, buf, n);
}

int urdf_num_links(void* h) { return (int)static_cast<Model*>(h)->links.size(); }
int urdf_num_joints(void* h) { return (int)static_cast<Model*>(h)->joints.size(); }

// link record: mass, com[3], com_rpy[3], inertia[6] -> 13 doubles
void urdf_link(void* h, int i, char* name, int nlen, double* out13) {
  const Link& l = static_cast<Model*>(h)->links[i];
  copy_str(l.name, name, nlen);
  out13[0] = l.mass;
  std::memcpy(out13 + 1, l.com, 3 * sizeof(double));
  std::memcpy(out13 + 4, l.com_rpy, 3 * sizeof(double));
  std::memcpy(out13 + 7, l.inertia, 6 * sizeof(double));
}

int urdf_link_num_spheres(void* h, int i) {
  return (int)static_cast<Model*>(h)->links[i].spheres.size();
}

void urdf_link_sphere(void* h, int i, int s, double* out4) {
  const auto& sp = static_cast<Model*>(h)->links[i].spheres[s];
  std::memcpy(out4, sp.data(), 4 * sizeof(double));
}

// joint record: xyz[3], rpy[3], axis[3], lower, upper, effort, damping -> 13
void urdf_joint(void* h, int i, char* name, int nlen, char* type, int tlen,
                char* parent, int plen, char* child, int clen, double* out13) {
  const Joint& j = static_cast<Model*>(h)->joints[i];
  copy_str(j.name, name, nlen);
  copy_str(j.type, type, tlen);
  copy_str(j.parent, parent, plen);
  copy_str(j.child, child, clen);
  std::memcpy(out13, j.xyz, 3 * sizeof(double));
  std::memcpy(out13 + 3, j.rpy, 3 * sizeof(double));
  std::memcpy(out13 + 6, j.axis, 3 * sizeof(double));
  out13[9] = j.lower;
  out13[10] = j.upper;
  out13[11] = j.effort;
  out13[12] = j.damping;
}

}  // extern "C"
