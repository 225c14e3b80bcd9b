package graft.gateway

/** One JVM-global, case-insensitive relation→handler registry,
  * shared by every SQL-routing surface ([[MergeRoutes]],
  * [[DmlRoutes]], [[TimeTravelRoutes]] each instantiate one). Names
  * are stored lowercased — clients address relations as `orders` or
  * `sales.orders`, exactly as they appear in SQL. JVM-global on
  * purpose: Thrift connections run in fresh `newSession()`s but
  * share the process, exactly like the published global temp views
  * they read.
  */
private[gateway] final class RouteRegistry[H] {

  private val routes =
    new java.util.concurrent.ConcurrentHashMap[String, H]()

  private def norm(relation: String): String =
    relation.toLowerCase(java.util.Locale.ROOT)

  def register(relation: String, handler: H): Unit =
    routes.put(norm(relation), handler): Unit

  def unregister(relation: String): Unit =
    routes.remove(norm(relation)): Unit

  def lookup(relation: String): Option[H] =
    Option(routes.get(norm(relation)))
}
