PREFIX : <http://example/>
WITH :g1 DELETE { :s1 :q ?o } INSERT { :s1 :q2 ?o } WHERE { :s1 :q ?o }
