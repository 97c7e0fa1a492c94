package graft.util

/** P10: dot-path configuration getter — the reference's
  * `get_config_value("a.b.c", default)` over nested YAML
  * (`src/utils/config_loader.py:109-132`), as a pure function over
  * nested maps (engine config is not a relational concern). */
object Conf {
  type Nested = Map[String, Any]

  def get(conf: Nested, path: String, default: Any = null): Any = {
    val parts = path.split('.')
    @annotation.tailrec
    def walk(cur: Any, i: Int): Any = cur match {
      case _ if i == parts.length => cur
      case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]].get(parts(i)) match {
          case Some(v) => walk(v, i + 1)
          case None => default
        }
      case _ => default
    }
    walk(conf, 0)
  }
}
