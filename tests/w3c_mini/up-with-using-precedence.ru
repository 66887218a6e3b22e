PREFIX : <http://example/>
WITH :g1 DELETE { :s1 :p ?o } USING :g2 WHERE { :s2 :p ?o2 . BIND(:o1 AS ?o) }
